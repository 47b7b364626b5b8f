"""End-to-end FID stats pipeline (VERDICT r1 item 6b/6c): synthetic CIFAR
records -> loader -> inception features -> mu/sigma npz -> FID consumer.

With the two external blobs supplied (pt_inception pth + real dataset) this
exact pipeline produces the reference's ``weights/cifar10_mu_sigma.npz``;
here a small feature extractor keeps the smoke run fast."""

import numpy as np
import pytest

from naturaldiffusion_tpu.apps.fid_stats import compute_dataset_stats, main
from naturaldiffusion_tpu.data import NativeBatchLoader
from naturaldiffusion_tpu.eval.fid import fid_from_samples


@pytest.fixture(scope="module")
def cifar_bin(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("cifar_fid")
    paths = []
    for fi in range(2):
        n = 40
        rec = np.empty((n, 1 + 3072), np.uint8)
        rec[:, 0] = rng.integers(0, 10, n)
        rec[:, 1:] = rng.integers(0, 256, (n, 3072))
        p = d / f"data_batch_{fi + 1}.bin"
        rec.tofile(p)
        paths.append(str(p))
    return paths


def _tiny_feature_fn(images):
    """Deterministic 8-d 'features' (mean/std pooled) — stands in for the
    2048-d inception features so the smoke test runs in seconds."""
    x = np.asarray(images, np.float64).reshape(len(images), -1, 3)
    return np.concatenate([x.mean(1), x.std(1),
                           x.min(1)[:, :1], x.max(1)[:, :1]], axis=1)


def test_compute_stats_deterministic_order(cifar_bin):
    loader = NativeBatchLoader(cifar_bin)
    mu1, s1, n1 = compute_dataset_stats(loader, _tiny_feature_fn,
                                        batch_size=16)
    mu2, s2, n2 = compute_dataset_stats(loader, _tiny_feature_fn,
                                        batch_size=32)
    assert n1 == n2 == 80
    np.testing.assert_allclose(mu1, mu2, atol=1e-12)
    np.testing.assert_allclose(s1, s2, atol=1e-12)


def test_pipeline_npz_roundtrip(cifar_bin, tmp_path, monkeypatch):
    """The app writes {mu, sigma}; fid_from_samples reads it; FID of the
    dataset against itself is ~0."""
    out = tmp_path / "stats.npz"

    # patch the (heavy) inception extractor with the tiny one
    import naturaldiffusion_tpu.apps.fid_stats as app
    monkeypatch.setattr(
        "naturaldiffusion_tpu.eval.inception.default_feature_fn",
        lambda pth=None: _tiny_feature_fn)
    rc = app.main(["--data", *cifar_bin, "--out", str(out), "--batch", "32"])
    assert rc == 0

    with np.load(out) as f:
        assert f["mu"].shape == (8,)
        assert f["sigma"].shape == (8, 8)

    loader = NativeBatchLoader(cifar_bin)
    imgs, _ = loader.gather(np.arange(80))
    fid = fid_from_samples(imgs * 2 - 1, str(out),
                           feature_fn=_tiny_feature_fn)
    assert abs(fid) < 1e-6, fid

    # a different distribution scores clearly worse
    rng = np.random.default_rng(1)
    other = rng.uniform(-0.4, 0.4, imgs.shape).astype(np.float32)
    fid_other = fid_from_samples(other, str(out), feature_fn=_tiny_feature_fn)
    assert fid_other > 1e-3, fid_other
