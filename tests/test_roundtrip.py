"""Procedural-dataset generator + train->sample->FID round-trip driver.

The hardware run of ``apps/roundtrip.py`` is the r4 stand-in for the
env-blocked real-data loop (``src/CIFAR10NaturalInference.py:241-317``);
these tests pin the generator's ground-truth properties and smoke the
whole driver on CPU at toy size."""

import subprocess
import sys

import numpy as np
import pytest

from naturaldiffusion_tpu.apps import toy_dataset as td


def test_toy_dataset_written_layout(tmp_path):
    out = tmp_path / "toy"
    assert td.main(["--out", str(out), "--n-train", "64",
                    "--n-eval", "32", "--chunk", "17"]) == 0

    from naturaldiffusion_tpu.data.native_loader import NativeBatchLoader
    tr = NativeBatchLoader([str(out / "data_batch_1.bin")])
    ev = NativeBatchLoader([str(out / "test_batch.bin")])
    assert len(tr) == 64 and len(ev) == 32
    imgs, labels = tr.gather(np.arange(64))
    assert imgs.shape == (64, 32, 32, 3) and imgs.dtype == np.float32
    assert 0.0 <= imgs.min() and imgs.max() <= 1.0
    assert (labels == 0).all()

    # deterministic: regeneration is byte-identical
    out2 = tmp_path / "toy2"
    td.main(["--out", str(out2), "--n-train", "64", "--n-eval", "32"])
    assert (out / "data_batch_1.bin").read_bytes() == \
        (out2 / "data_batch_1.bin").read_bytes()

    # splits are disjoint draws of one stream, not copies
    ei, _ = ev.gather(np.arange(32))
    assert not any(np.array_equal(imgs[i], ei[j])
                   for i in range(8) for j in range(8))


def test_summary_stats_recover_generator_params():
    params = td.draw_params(512)
    imgs = td.render(params, 0, 512).astype(np.float32) / 255.0
    st = td.summary_stats(imgs)

    # grad_delta tracks the drawn endpoint difference; the ellipse biases
    # individual images, so compare distribution means, not per-image
    want = (params["c1"] - params["c0"]).mean(axis=1) / 255.0
    assert abs(st["grad_delta"].mean() - want.mean()) < 0.02
    assert np.corrcoef(st["grad_delta"], want)[0, 1] > 0.95

    # ellipse pixel coverage tracks pi*rx*ry/1024
    want_frac = (np.pi * params["radii"][:, 0] * params["radii"][:, 1]
                 / 1024.0)
    assert np.corrcoef(st["ellipse_frac"], want_frac)[0, 1] > 0.9
    assert abs(st["ellipse_frac"].mean() - want_frac.mean()) < 0.03

    # W1 of a distribution with itself (two halves) is near zero and far
    # below W1 against a shifted copy
    w_self = td.wasserstein1(st["img_mean"][:256], st["img_mean"][256:])
    w_shift = td.wasserstein1(st["img_mean"][:256],
                              st["img_mean"][256:] + 0.3)
    assert w_self < 0.02 < 0.25 < w_shift


def test_roundtrip_smoke(tmp_path):
    """3 training steps + the full roundtrip driver at toy size: the CSV
    must contain the step-0 baseline and the snapshot row, all finite."""
    data = tmp_path / "toy"
    td.main(["--out", str(data), "--n-train", "64", "--n-eval", "64"])

    work = tmp_path / "work"
    env_args = ["--workdir", str(work), "--data-dir", str(data),
                "--nf", "16", "--ch-mult", "1,2", "--num-res-blocks", "1"]
    r = subprocess.run(
        [sys.executable, "-m", "naturaldiffusion_tpu.apps.train",
         "--mode", "train", "--batch", "8", "--n-iters", "3",
         "--warmup", "1", "--snapshot-freq", "2", "--preemption-freq",
         "1000", "--no-snapshot-samples", *env_args],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    from naturaldiffusion_tpu.apps import roundtrip
    out = tmp_path / "rt.csv"
    assert roundtrip.main(
        ["--num", "16", "--batch", "16", "--micro", "0", "--steps", "4",
         "--features", "toy",
         "--eval-n", "64", "--feat-batch", "16", "--out", str(out),
         *env_args]) == 0

    import csv as _csv
    rows = list(_csv.DictReader(open(out)))
    assert [int(r["step"]) for r in rows] == [0, 2]
    for r in rows:
        assert r["finite"] == "True"
        assert np.isfinite(float(r["fid"]))
        assert r["features"] == "toy-conv"
        for k in ("w1_img_mean", "w1_grad_delta", "w1_ellipse_frac"):
            assert np.isfinite(float(r[k]))
    assert (work / "grids" / "step_0.png").exists()
    assert (work / "grids" / "step_2.png").exists()
