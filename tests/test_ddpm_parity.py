"""DDPM UNet flax-vs-torch-reference forward parity (same method as the
NCSN++ parity suite)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_ncsnpp_parity import (_install_op_stub, _patch_interpolate,  # noqa: E402
                                REF)


def _ref_config():
    from types import SimpleNamespace as NS
    model = dict(nf=32, ch_mult=(1, 2), num_res_blocks=1,
                 attn_resolutions=(8,), dropout=0.0, resamp_with_conv=True,
                 conditional=True, nonlinearity="swish", scale_by_sigma=False,
                 sigma_min=0.01, sigma_max=50, num_scales=1000,
                 beta_min=0.1, beta_max=20.0)
    return NS(model=NS(**model),
              data=NS(image_size=16, num_channels=3, centered=True),
              training=NS(continuous=False))


def _build_reference(config):
    _install_op_stub()
    _patch_interpolate()
    for k in [k for k in sys.modules
              if k == "models" or k.startswith("models.")]:
        if getattr(sys.modules[k], "__file__", "") and \
                REF not in sys.modules[k].__file__:
            del sys.modules[k]
    while REF in sys.path:
        sys.path.remove(REF)
    sys.path.insert(0, REF)
    from models import ddpm as ref_ddpm
    return ref_ddpm.DDPM(config)


def test_ddpm_forward_parity():
    import jax
    import jax.numpy as jnp
    from naturaldiffusion_tpu.models.ddpm import (DDPM, DDPMConfig,
                                                  ddpm_torch_path_map)
    from naturaldiffusion_tpu.models.convert import fill_from_torch

    torch.manual_seed(0)
    ref = _build_reference(_ref_config()).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    labels = np.asarray([3, 700], np.int64)

    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   torch.from_numpy(labels)).numpy()

    cfg = DDPMConfig(image_size=16, nf=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), dropout=0.0)
    model = DDPM(config=cfg)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), x_nhwc,
                          jnp.asarray(labels))["params"]
    params, unused = fill_from_torch(template, ref.state_dict(),
                                     path_map=ddpm_torch_path_map)
    assert unused == ["sigmas"], unused
    got = model.apply({"params": params}, x_nhwc, jnp.asarray(labels))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
