"""Config zoo vs the reference tree (VERDICT r1 item 7).

Enumerates every experiment file under the reference's ``configs/{vp,ve,
subvp}/``, executes it (``get_default_configs()`` + overrides, exactly as
``main.py --config`` would), and asserts our preset carries the same
model/SDE/sampling hyperparameters.  Skipped when the reference snapshot is
absent — the extracted values live on in ``configs_zoo.py`` either way."""

import glob
import importlib.util
import os
import sys

import pytest

REF = "/root/reference/deps/score_sde_pytorch"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference snapshot not present")


def _ref_config_names():
    if not os.path.isdir(REF):
        return []
    base = os.path.join(REF, "configs")
    names = []
    for p in sorted(glob.glob(base + "/**/*.py", recursive=True)):
        rel = os.path.relpath(p, base)[:-3]
        if not rel.startswith("default_"):
            names.append(rel)
    return names


def _load_ref(rel):
    sys.path.insert(0, REF)
    try:
        p = os.path.join(REF, "configs", rel + ".py")
        spec = importlib.util.spec_from_file_location(
            "refcfg_" + rel.replace("/", "_"), p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.get_config()
    finally:
        sys.path.remove(REF)


@pytest.mark.parametrize("rel", _ref_config_names())
def test_preset_matches_reference_file(rel):
    from naturaldiffusion_tpu.configs import CONFIGS

    ref = _load_ref(rel)
    assert rel in CONFIGS, f"no preset for reference config {rel}"
    ours = CONFIGS[rel]

    m, tr, sa, da = ref.model, ref.training, ref.sampling, ref.data

    # family
    assert ours.model_family == m.name

    # model hyperparameters (field names differ per family)
    if m.name == "ncsnpp":
        for f in ("nf", "num_res_blocks", "dropout", "resamp_with_conv",
                  "conditional", "fir", "skip_rescale", "resblock_type",
                  "progressive", "progressive_input", "progressive_combine",
                  "embedding_type", "init_scale"):
            assert getattr(ours.model, f) == getattr(m, f), f
        assert tuple(ours.model.ch_mult) == tuple(m.ch_mult)
        assert tuple(ours.model.attn_resolutions) == tuple(m.attn_resolutions)
        assert ours.model.num_train_timesteps == m.num_scales
        assert ours.model.scale_by_sigma == m.scale_by_sigma
        # three discrete ncsnpp files predate the fourier embedding knob
        assert ours.model.fourier_scale == m.get("fourier_scale", 16)
    elif m.name == "ddpm":
        for f in ("nf", "num_res_blocks", "dropout", "resamp_with_conv",
                  "conditional", "scale_by_sigma"):
            assert getattr(ours.model, f) == getattr(m, f), f
        assert tuple(ours.model.ch_mult) == tuple(m.ch_mult)
        assert ours.model.num_scales == m.num_scales
    else:  # ncsn / ncsnv2_*
        assert ours.model.nf == m.nf
        assert ours.model.sigma_min == m.sigma_min
        assert ours.model.sigma_max == m.sigma_max
        assert ours.model.num_scales == m.num_scales

    # SDE + training
    ref_sde = tr.get("sde", "vesde")       # ve/ncsn/* predate training.sde
    assert ours.training.sde == ref_sde
    ref_cont = tr.get("continuous", tr.get("continuouse", False))
    assert ours.training.continuous == ref_cont
    assert ours.training.reduce_mean == tr.reduce_mean
    assert ours.training.likelihood_weighting == tr.likelihood_weighting
    assert ours.training.n_iters == tr.n_iters
    assert ours.training.batch_size == tr.batch_size
    assert ours.training.beta_min == m.get("beta_min", 0.1)
    assert ours.training.beta_max == m.get("beta_max", 20.0)
    assert ours.training.sigma_min == m.get("sigma_min", 0.01)
    assert ours.training.sigma_max == m.get("sigma_max", 50.0)
    assert ours.training.num_scales == m.get("num_scales", 1000)
    assert ours.training.ema_rate == m.get("ema_rate", 0.9999)
    assert ours.training.lr == ref.optim.lr
    assert ours.training.warmup == ref.optim.warmup
    assert ours.training.grad_clip == ref.optim.grad_clip

    # sampling
    for f in ("method", "predictor", "corrector", "snr", "n_steps_each",
              "noise_removal", "probability_flow"):
        assert getattr(ours.sampling, f) == sa.get(f), f

    # data
    assert ours.data.dataset == da.dataset.lower()
    assert ours.data.image_size == da.image_size
    assert ours.data.num_channels == da.num_channels
    assert ours.data.centered == da.centered
    assert ours.data.random_flip == da.random_flip
