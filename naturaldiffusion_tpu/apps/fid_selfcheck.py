"""FID pipeline at its REAL scale — the reference's 50k-sample loop
(``src/CIFAR10NaturalInference.py:288-313``: 100 batches of 500 -> 50,000
images -> InceptionV3 -> Frechet) driven end-to-end on hardware.

The reference's weight blobs (checkpoint_8.pth, pt_inception,
cifar10_mu_sigma.npz) are absent from this snapshot, so no *real* FID can be
computed — but the pipeline's scale behavior (OOMs, host-transfer stalls,
accumulator bugs) is independent of the weights.  This app runs the whole
loop with random weights (identical FLOPs) and checks the two properties the
Frechet estimator must have:

* **split-half self-FID ~ 0**: features of the first and second 25k samples
  come from the same distribution, so their Frechet distance is only
  estimator bias;
* **shifted-distribution FID >> 0**: a pixel-space shift of the same samples
  must score far worse.

Artifacts: a ``results/FID``-shaped CSV row (provenance-stamped
``weights=random``), the sample/feature statistics npz, and wall-clock /
steady-rate numbers for every stage.  With ``--ckpt`` + ``--inception`` +
``--ref-stats`` the same code path produces the reference-comparable FID
(readiness, VERDICT r2 missing #3).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import numpy as np

from .cifar10_ni import load_params, make_sampler
from ..coeffs import registry
from ..coeffs.matrix import CoeffMatrix
from ..eval.fid import (activations, compute_statistics, frechet_distance,
                        inception_score)
from ..models.ncsnpp import NCSNpp, CIFAR10_DDPMPP_CONTINUOUS
from ..parallel import make_mesh, batch_sharding


def sample_images(args, mesh) -> tuple[np.ndarray, float, float]:
    """NI-sample ``args.num`` images; returns (images, steady img/s, wall)."""
    import jax.numpy as jnp

    matrix = CoeffMatrix.load(args.weights) if args.weights \
        else registry.derive("ddpm", args.steps)
    cfg = CIFAR10_DDPMPP_CONTINUOUS
    if args.toy:
        from ..models.ncsnpp import NCSNppConfig
        cfg = NCSNppConfig(nf=16, ch_mult=(1, 2), num_res_blocks=1,
                           attn_resolutions=(16,), dropout=0.0)
    model = NCSNpp(config=cfg)
    params = load_params(args.ckpt, model, jax.random.PRNGKey(0))
    run = make_sampler(params, model, matrix, batch=args.batch,
                       micro=args.micro, mesh=mesh)

    # every dispatch is a FULL batch (one compiled shape — a fresh-shape
    # tail batch would pay a second multi-minute XLA compile through the
    # tunnel); the excess of the last batch is discarded
    b = args.batch + (-args.batch % mesh.devices.size)
    nbatch = -(-args.num // args.batch)
    images = np.empty((args.num, 32, 32, 3), np.float32)
    key = jax.random.PRNGKey(args.seed)
    wall0 = time.time()
    t0 = None
    done = first = 0
    for i in range(nbatch):
        key, k1, k2 = jax.random.split(key, 3)
        init = jax.random.normal(k1, (b, 32, 32, 3), jnp.float32)
        init = jax.device_put(init, batch_sharding(mesh, 4))
        out = np.asarray(run(init, k2), np.float32)
        if t0 is None:            # first batch paid compile; exclude it
            t0, first = time.time(), args.batch
        take = min(args.batch, args.num - done)
        images[done:done + take] = out[:take]
        done += take
        if i % 8 == 7 or done >= args.num:
            rate = (done - first) / max(time.time() - t0, 1e-9) \
                if done > first else float("nan")
            print(f"  sample {done}/{args.num} ({rate:.1f} img/s steady)",
                  flush=True)
    rate = (done - first) / max(time.time() - t0, 1e-9) \
        if done > first else float("nan")
    return images, rate, time.time() - wall0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num", type=int, default=50000)   # the reference scale
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--micro", type=int, default=64)
    p.add_argument("--feat-batch", type=int, default=256)
    p.add_argument("--seed", type=int, default=888)    # the reference seed
    p.add_argument("--ckpt", default=None, help="converted checkpoint_8.pth")
    p.add_argument("--weights", default=None, help="NI weight npz")
    p.add_argument("--inception", default=None,
                   help="pt_inception-2015-12-05.pth")
    p.add_argument("--ref-stats", default=None,
                   help="cifar10_mu_sigma.npz for a real FID number")
    p.add_argument("--no-is", action="store_true",
                   help="skip the Inception Score head (pool-only pass)")
    p.add_argument("--toy", action="store_true",
                   help="tiny NCSN++ (smoke tests; estimator checks only)")
    p.add_argument("--feat-dim", type=int, default=0,
                   help="use only the first D pool features (0 = all 2048). "
                        "For smoke-scale runs: with N < ~2048 samples the "
                        "full covariances are rank-deficient and sqrtm "
                        "raises, exactly like pytorch-fid at tiny N")
    p.add_argument("--out", default="results/FID/selfcheck.csv")
    args = p.parse_args(argv)

    prov = "converted" if args.ckpt else "random"
    if args.toy:
        prov += "-toy"          # never mistakable for the full-size run
    # env var may be seen too late (jax imports with the package); the
    # config update is authoritative either way
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    mesh = make_mesh()
    print(f"devices: {jax.devices()} (mesh {mesh.devices.size}-wide), "
          f"weights={prov}")

    wall_start = time.time()
    images, sample_rate, sample_wall = sample_images(args, mesh)
    assert np.isfinite(images).all(), "sampler produced non-finite pixels"

    # ---- inception features over all N (the reference's get_activation;
    # one pass serves both FID pool features and IS logits, like
    # deps/score_sde_pytorch/run_lib.py:175-407) ---------------------------
    from ..eval.inception import default_feature_fn
    with_logits = not args.no_is
    feature_fn = default_feature_fn(args.inception, with_logits=with_logits)
    imgs01 = np.clip((images + 1.0) * 0.5, 0.0, 1.0)
    t0 = time.time()
    feats = activations(imgs01, feature_fn, batch_size=args.feat_batch,
                        mesh=mesh if mesh.devices.size > 1 else None,
                        pad_to_batch=True)
    feat_wall = time.time() - t0
    feat_rate = len(feats) / feat_wall
    print(f"  features {feats.shape} in {feat_wall:.1f}s "
          f"({feat_rate:.0f} img/s)")
    is_mean = is_std = None
    if with_logits:
        logits = feats[:, 2048:].astype(np.float64)
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        is_mean, is_std = inception_score(probs)
        feats = feats[:, :2048]
    if args.feat_dim:
        feats = feats[:, :args.feat_dim]

    # ---- statistics + the two estimator properties ------------------------
    mu, sigma = compute_statistics(feats)
    half = len(feats) // 2
    mu_a, sig_a = compute_statistics(feats[:half])
    mu_b, sig_b = compute_statistics(feats[half:2 * half])
    self_fid = frechet_distance(mu_a, sig_a, mu_b, sig_b)

    # pixel-space shifted distribution over the first half: must score >> 0
    shifted01 = np.clip(imgs01[:half] * 0.7 + 0.25, 0.0, 1.0)
    t0 = time.time()
    feats_shift = activations(shifted01, feature_fn,
                              batch_size=args.feat_batch,
                              mesh=mesh if mesh.devices.size > 1 else None,
                              pad_to_batch=True)[:, :2048]
    if args.feat_dim:
        feats_shift = feats_shift[:, :args.feat_dim]
    shift_wall = time.time() - t0
    mu_s, sig_s = compute_statistics(feats_shift)
    shifted_fid = frechet_distance(mu, sigma, mu_s, sig_s)

    real_fid = None
    if args.ref_stats:
        with np.load(args.ref_stats) as f:
            real_fid = frechet_distance(mu, sigma, f["mu"], f["sigma"])

    total_wall = time.time() - wall_start
    # with random inception weights the ABSOLUTE Frechet scale is arbitrary
    # (the features span a near-degenerate subspace), so the estimator check
    # is relative: the shifted distribution must score orders of magnitude
    # worse than the same-distribution split
    ratio = shifted_fid / max(self_fid, 1e-300)
    row = {
        "weights": prov,
        "inception": "converted" if args.inception else "random",
        "num": args.num, "steps": args.steps,
        "self_fid_25k_split": float(f"{self_fid:.6g}"),
        "shifted_fid": float(f"{shifted_fid:.6g}"),
        "shifted_over_self": float(f"{ratio:.4g}"),
        "fid_vs_ref_stats": round(real_fid, 4) if real_fid is not None
        else "",
        "is_mean": round(is_mean, 4) if is_mean is not None else "",
        "is_std": round(is_std, 4) if is_std is not None else "",
        "sample_img_per_sec": round(sample_rate, 1),
        "feature_img_per_sec": round(feat_rate, 1),
        "sample_wall_s": round(sample_wall, 1),
        "feature_wall_s": round(feat_wall + shift_wall, 1),
        "total_wall_s": round(total_wall, 1),
    }
    print(json.dumps(row))

    ok = self_fid < 2.0 and ratio > 50.0
    if not ok:
        print(f"SELF-CHECK FAILED: self_fid={self_fid} "
              f"shifted_fid={shifted_fid} (ratio {ratio:.1f})")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(row.keys()))
        w.writeheader()
        w.writerow(row)
    np.savez(os.path.splitext(args.out)[0] + "_stats.npz",
             mu=mu, sigma=sigma, weights=np.asarray(prov))
    print(f"-> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
