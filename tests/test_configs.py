"""Config registry: every preset instantiates its model and matches its SDE."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from naturaldiffusion_tpu.configs import CONFIGS, get_config


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_preset_model_instantiates(name):
    cfg = get_config(name)
    if cfg.data.image_size > 32:
        pytest.skip("large-image preset (init too slow for unit tests)")
    c = cfg.data.num_channels
    if cfg.model_family.startswith("ncsnv2") or cfg.model_family == "ncsn":
        from naturaldiffusion_tpu.models import create_model
        model = create_model(cfg.model_family,
                             dataclasses.replace(cfg.model, nf=16))
        t = jnp.zeros((1,), jnp.int32)
    elif cfg.model_family == "ncsnpp":
        from naturaldiffusion_tpu.models.ncsnpp import NCSNpp
        import numpy as np
        # shrink for test speed, keep every structural switch
        mcfg = dataclasses.replace(cfg.model, nf=16,
                                   ch_mult=cfg.model.ch_mult[:2],
                                   num_res_blocks=1)
        sigmas = ()
        if mcfg.scale_by_sigma and mcfg.embedding_type == "positional":
            # discrete VE configs need the geometric sigma table
            tr = cfg.training
            sigmas = tuple(np.exp(np.linspace(np.log(tr.sigma_max),
                                              np.log(tr.sigma_min),
                                              tr.num_scales)))
        model = NCSNpp(config=mcfg, sigmas=sigmas)
        t = jnp.full((1,), 0.5 if cfg.training.continuous else 500.0)
    else:
        from naturaldiffusion_tpu.models.ddpm import DDPM
        mcfg = dataclasses.replace(cfg.model, nf=32,
                                   ch_mult=cfg.model.ch_mult[:2],
                                   num_res_blocks=1,
                                   attn_resolutions=(16,))
        model = DDPM(config=mcfg)
        t = jnp.full((1,), 500.0)
    x = jnp.zeros((1, 32, 32, c))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (1, 32, 32, c)


def test_flagship_preset_values():
    cfg = get_config("vp/cifar10_ddpmpp_continuous")
    assert cfg.model.nf == 128 and cfg.model.ch_mult == (1, 2, 2, 2)
    assert cfg.model.resblock_type == "biggan"
    assert cfg.training.sde == "vpsde" and cfg.training.continuous
    assert cfg.training.snapshot_freq_for_preemption == 10_000


def test_zoo_is_complete():
    """All 39 reference experiment files are represented."""
    assert len(CONFIGS) == 39
    for prefix, want in [("vp/", 12), ("ve/", 22), ("subvp/", 5)]:
        assert sum(k.startswith(prefix) for k in CONFIGS) == want, prefix
