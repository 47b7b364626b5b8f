"""Smoke test for the training-throughput bench app.

``apps/bench_train.py`` drives the reference's training substrate
(``deps/score_sde_pytorch/run_lib.py:127-173``) as a perf bench; this pins
the app end-to-end at toy scale so the bench itself can't bitrot: the
chained ``lax.scan`` step runs, the cost analysis yields a positive FLOPs
denominator, and the JSON line parses with finite numbers.
"""

import json

import numpy as np


def test_bench_train_smoke(capsys):
    from naturaldiffusion_tpu.apps.bench_train import main

    rc = main(["--batch", "2", "--chain", "2", "--nf", "8"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["batch"] == 2 and rec["chain"] == 2
    assert rec["flops_per_step"] > 0
    for k in ("step_ms", "img_per_sec", "tflops", "mfu_vs_f32_peak"):
        assert np.isfinite(rec[k]) and rec[k] > 0, (k, rec)
