"""Smoke tests for the chip-bench CLIs at toy scale.

These apps (``bench_sd3``, ``bench_dit``) are normally exercised only on
the real chip; a CPU toy-scale run pins the whole app — model build, the
mods/no-mods conditioning paths, the jitted NI scan, the JSON line — so
they can't bitrot between chip sessions (``bench_train`` caught exactly
such a rot in its own smoke test).
"""

import json

import numpy as np
import pytest


def _last_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


@pytest.mark.parametrize("extra", [[], ["--no-mods"]],
                         ids=["mods", "no-mods"])
def test_bench_sd3_toy(capsys, extra):
    from naturaldiffusion_tpu.apps.bench_sd3 import main

    rc = main(["--toy", "--latent", "8", "--steps", "3", "--ctx", "4"]
              + extra)
    assert rc == 0
    rec = _last_json(capsys)
    assert rec["model"].startswith("toy-mmdit")
    assert rec["steps"] == 3
    assert np.isfinite(rec["sec_per_image"]) and rec["sec_per_image"] > 0
    # r5: auditable MFU fields (utils/flops.py)
    assert rec["flops_per_fwd"] > 0 and 0 <= rec["mfu"]
    assert rec["flops_source"] in ("lowering", "cpu_compiled")


def test_bench_conv_toy(capsys):
    from naturaldiffusion_tpu.apps.bench_conv import main

    rc = main(["--toy"])
    assert rc == 0
    rec = _last_json(capsys)
    assert rec["shape"] == [2, 8, 8, 128, 128]
    assert rec["xla_ms"] > 0 and rec["pallas_ms"] > 0
    assert np.isfinite(rec["speedup"])


def test_bench_conv_model_toy(monkeypatch):
    """`bench_conv --model` (in-model conv-backend A/B) at a tiny
    monkeypatched config: all four modes must produce a time, and the
    env flags must be restored afterwards."""
    from naturaldiffusion_tpu import configs
    from naturaldiffusion_tpu.apps.bench_conv import bench_model
    from naturaldiffusion_tpu.models.ncsnpp import NCSNppConfig

    tiny = configs.ExperimentConfig(
        name="toy", model_family="ncsnpp",
        model=NCSNppConfig(image_size=16, num_channels=3, nf=128,
                           ch_mult=(1,), num_res_blocks=1,
                           attn_resolutions=(), dropout=0.0),
        training=configs.TrainingConfig(),
        sampling=configs.SamplingConfig(),
        data=configs.DataConfig(image_size=16))
    monkeypatch.setattr(configs, "get_config", lambda name: tiny)
    monkeypatch.delenv("NATDIFF_PALLAS_CONV", raising=False)

    rec = bench_model("toy", batch=1, reps=1, runs=1)
    for label in ("xla", "pallas_tiled", "pallas_tiledew", "pallas_fused"):
        assert rec[f"{label}_ms"] > 0, rec
    import os
    assert os.environ.get("NATDIFF_PALLAS_CONV") is None


@pytest.mark.parametrize("extra", [[], ["--no-mods"]],
                         ids=["mods", "no-mods"])
def test_bench_dit_toy(capsys, extra):
    from naturaldiffusion_tpu.apps.bench_dit import main

    rc = main(["--toy", "--steps", "3"] + extra)
    assert rc == 0
    rec = _last_json(capsys)
    assert rec["model"].startswith("toy-dit")
    assert np.isfinite(rec["sec_per_image"]) and rec["sec_per_image"] > 0
    assert rec["flops_per_fwd"] > 0 and 0 <= rec["mfu"]
    assert rec["flops_source"] in ("lowering", "cpu_compiled")
