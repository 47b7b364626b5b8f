"""FID — Frechet Inception Distance (reference:
``src/CIFAR10NaturalInference.py:44-86`` on pytorch-fid).

Pieces:

* :func:`frechet_distance` — exact Frechet distance between two Gaussians
  (scipy ``sqrtm`` on host, float64), numerically identical to pytorch-fid's
  ``calculate_frechet_distance``.
* :func:`compute_statistics` — (mu, sigma) from a feature matrix.
* :func:`activations` — batched feature extraction through any jax feature
  fn (the Flax InceptionV3 port in :mod:`.inception` reproduces pytorch-fid
  when its ``pt_inception-2015-12-05.pth`` weights are converted; the
  reference stats file ``weights/cifar10_mu_sigma.npz`` is missing from the
  snapshot — ``.MISSING_LARGE_BLOBS:3``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def compute_statistics(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    feats = np.asarray(feats, np.float64)
    return feats.mean(axis=0), np.cov(feats, rowvar=False)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """pytorch-fid ``calculate_frechet_distance``, bit-compatible."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real

    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activations(images: np.ndarray, feature_fn: Callable,
                batch_size: int = 256, mesh=None,
                pad_to_batch: bool = False) -> np.ndarray:
    """[N, H, W, C] in [0, 1] -> [N, D] features, batched.

    With ``mesh`` the batch is sharded over the ``data`` axis — the
    reference's ``run_inception_distributed``
    (``deps/score_sde_pytorch/evaluation.py:108-146``) on XLA collectives
    instead of TF device loops.

    ``pad_to_batch``: edge-pad the tail chunk up to a full ``batch_size`` so
    the jitted feature fn compiles exactly ONE shape (a fresh tail shape
    costs a full XLA recompile — minutes for InceptionV3 on the tunnel)."""
    if mesh is not None:
        # resolve the device-multiple batch size BEFORE the pad_to_batch
        # split, or the padded tail (caller's batch_size) and the loop
        # (rounded batch_size) disagree and a remainder chunk sneaks in a
        # second compiled shape — the exact recompile the flag exists to
        # avoid
        ndev = mesh.devices.size
        batch_size = max(batch_size // ndev * ndev, ndev)
    if pad_to_batch:
        n = len(images)
        tail = n % batch_size
        if tail:
            padded = np.concatenate(
                [images[n - tail:],
                 np.repeat(images[-1:], batch_size - tail, axis=0)])
            last = activations(padded, feature_fn,
                               batch_size=batch_size, mesh=mesh)[:tail]
            if n == tail:       # whole input smaller than one batch
                return last
            head = activations(images[:n - tail], feature_fn,
                               batch_size=batch_size, mesh=mesh)
            return np.concatenate([head, last])
    if mesh is not None:
        from ..parallel import batch_sharding
        import jax

        def put(x):
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
    else:
        def put(x):
            return x

    out = []
    for i in range(0, len(images), batch_size):
        chunk = images[i:i + batch_size]
        if mesh is not None and len(chunk) % mesh.devices.size:
            n = len(chunk)
            pad = -n % mesh.devices.size
            # edge-repeat: correct even when the tail chunk is shorter than
            # the pad amount (chunk[:pad] would under-fill there)
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            out.append(np.asarray(feature_fn(put(chunk)))[:n])
        else:
            out.append(np.asarray(feature_fn(put(chunk))))
    return np.concatenate(out)


def inception_score(probs: np.ndarray, splits: int = 10) -> tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over splits; (mean, std).
    Reference pipeline: ``deps/score_sde_pytorch/evaluation.py`` /
    ``run_lib.py:175-407`` report IS next to FID."""
    probs = np.asarray(probs, np.float64)
    scores = []
    for part in np.array_split(probs, splits):
        py = part.mean(axis=0, keepdims=True)
        kl = np.sum(part * (np.log(part + 1e-16) - np.log(py + 1e-16)),
                    axis=1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def fid_from_samples(images: np.ndarray, stats_path: str,
                     feature_fn: Callable | None = None,
                     value_range=(-1.0, 1.0)) -> float:
    """images [N,H,W,C] in ``value_range`` vs reference (mu, sigma) npz
    (``weights/cifar10_mu_sigma.npz`` layout: keys ``mu``/``sigma``)."""
    with np.load(stats_path) as f:
        mu_ref = f["mu"] if "mu" in f else f["mu_sigma"][0]
        sig_ref = f["sigma"] if "sigma" in f else f["mu_sigma"][1]

    if feature_fn is None:
        from .inception import default_feature_fn
        feature_fn = default_feature_fn()

    lo, hi = value_range
    imgs01 = np.clip((np.asarray(images, np.float32) - lo) / (hi - lo), 0, 1)
    feats = activations(imgs01, feature_fn)
    mu, sigma = compute_statistics(feats)
    return frechet_distance(mu, sigma, mu_ref, sig_ref)
