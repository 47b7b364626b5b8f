"""End-to-end smoke of the 50k FID/IS app at toy scale.

``apps/fid_selfcheck.py`` is the repo's reproduction of the reference's
50k-sample eval loop (``src/CIFAR10NaturalInference.py:288-313`` for FID;
``deps/score_sde_pytorch/run_lib.py:175-407`` reports IS from the same
activations).  The real run happens on the chip; this pins the whole app —
sampler, feature pass with the IS logits head, statistics, CSV/npz
artifacts, provenance stamping — so it can't bitrot between chip runs.
(At 16 samples the split-half self-FID estimator check is meaningless, so
rc may be 1; the test asserts the pipeline and artifacts, not the check.)
"""

import csv
import os

import numpy as np


def _run(tmp_path, extra):
    from naturaldiffusion_tpu.apps.fid_selfcheck import main

    out = str(tmp_path / "selfcheck.csv")
    rc = main(["--toy", "--num", "16", "--batch", "16", "--micro", "0",
               "--steps", "4", "--feat-batch", "16", "--feat-dim", "6",
               "--out", out] + extra)
    assert rc in (0, 1)
    assert os.path.exists(out)
    with open(out, newline="") as fh:
        row = next(csv.DictReader(fh))
    stats = np.load(str(tmp_path / "selfcheck_stats.npz"))
    assert stats["mu"].shape == (6,)
    assert stats["sigma"].shape == (6, 6)
    assert str(stats["weights"]) == "random-toy"
    return row


def test_selfcheck_app_with_is(tmp_path):
    row = _run(tmp_path, [])
    assert row["weights"] == "random-toy"
    assert float(row["is_mean"]) >= 1.0      # IS lower bound by definition
    assert float(row["is_std"]) >= 0.0
    # sample_img_per_sec is legitimately NaN here: the steady rate excludes
    # the first (compile) batch and this run has only one batch
    for k in ("self_fid_25k_split", "shifted_fid"):
        assert np.isfinite(float(row[k])), (k, row)


def test_selfcheck_app_no_is(tmp_path):
    row = _run(tmp_path, ["--no-is"])
    assert row["is_mean"] == "" and row["is_std"] == ""
    assert np.isfinite(float(row["shifted_fid"]))
