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


def test_bench_conv_toy(capsys):
    from naturaldiffusion_tpu.apps.bench_conv import main

    rc = main(["--toy"])
    assert rc == 0
    rec = _last_json(capsys)
    assert rec["shape"] == [2, 8, 8, 128, 128]
    assert rec["xla_ms"] > 0 and rec["pallas_ms"] > 0
    assert np.isfinite(rec["speedup"])


@pytest.mark.parametrize("extra", [[], ["--no-mods"]],
                         ids=["mods", "no-mods"])
def test_bench_dit_toy(capsys, extra):
    from naturaldiffusion_tpu.apps.bench_dit import main

    rc = main(["--toy", "--steps", "3"] + extra)
    assert rc == 0
    rec = _last_json(capsys)
    assert rec["model"].startswith("toy-dit")
    assert np.isfinite(rec["sec_per_image"]) and rec["sec_per_image"] > 0
