"""Generative round trip: train -> snapshots -> 10-step NI -> FID curve.

The real-data version of this loop (``src/CIFAR10NaturalInference.py:
241-317`` sampling a trained ``checkpoint_8.pth`` and scoring FID) is
env-blocked by missing blobs, so this driver proves the identical
pipeline on the procedural distribution of ``apps/toy_dataset.py``:

1. dataset statistics through the production FID stack (native C++
   loader -> InceptionV3 features -> mu/sigma), plus the split-half
   FID *floor* and ground-truth scalar marginals (``summary_stats``);
2. for every orbax training snapshot in ``--workdir`` (plus the random
   init as step 0): restore the TrainState, take the EMA params, sample
   ``--num`` images with the SAME jitted 10-step NI executable the
   headline bench uses (one compile — params are a runtime argument),
   and score FID + per-marginal Wasserstein-1 against the dataset;
3. write an incremental CSV (resumable, provenance-stamped) and a
   sample grid per snapshot.

A healthy run shows FID and every W1 column falling monotonically
toward the floor — end-to-end evidence that training, checkpointing,
NI sampling, and the FID machinery compose, on hardware, with no
reference blobs involved.

Note the features: without ``--inception`` weights the extractor is the
deterministic random-init InceptionV3 (seeded) — a valid discriminative
metric for *this* comparison (both sides use the same features), NOT
comparable to published FID numbers; the CSV stamps it.
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..coeffs import registry
from ..data.native_loader import NativeBatchLoader
from ..eval.fid import (activations, compute_statistics, frechet_distance)
from ..eval.inception import default_feature_fn
from ..models.ncsnpp import NCSNpp, NCSNppConfig
from ..parallel import make_mesh, batch_sharding
from ..sde import VPSDE, SubVPSDE, VESDE
from ..train import make_train_step
from ..train import checkpoint as ckpt
from ..utils.plotting import save_image_grid
from .cifar10_ni import make_sampler
from .toy_dataset import summary_stats, wasserstein1

_SDES = {"vpsde": VPSDE, "subvpsde": SubVPSDE, "vesde": VESDE}


def toy_feature_fn(dim: int = 256):
    """Fixed random-conv extractor for CI smoke runs: InceptionV3 costs
    many minutes of XLA compile on a CPU host; the chip runs use the real
    thing (``--features inception``).  Deterministic (seeded), so the
    metric is comparable across processes like the inception fallback."""
    import flax.linen as nn

    class T(nn.Module):
        @nn.compact
        def __call__(self, x):
            for f in (32, 64, dim):
                x = nn.Conv(f, (3, 3), strides=(2, 2))(x)
                x = nn.gelu(x)
            return x.mean(axis=(1, 2))

    m = T()
    params = jax.jit(lambda k: m.init(
        k, jnp.zeros((1, 32, 32, 3)))["params"])(jax.random.PRNGKey(7))
    return jax.jit(lambda imgs: m.apply({"params": params},
                                        jnp.asarray(imgs)))


def dataset_side(args, feature_fn):
    """Eval-split features -> (mu, sigma), split-half FID floor, scalar
    marginals and their split-half W1 floors."""
    loader = NativeBatchLoader(
        [os.path.join(args.data_dir, "test_batch.bin")])
    n = min(len(loader), args.eval_n)
    images, _ = loader.gather(np.arange(n))          # float32 in [0, 1]
    feats = activations(images, feature_fn, batch_size=args.feat_batch)
    mu, sigma = compute_statistics(feats)
    half = n // 2
    floor = frechet_distance(*compute_statistics(feats[:half]),
                             *compute_statistics(feats[half:]))
    marg = summary_stats(images)
    marg_floor = {k: wasserstein1(v[:half], v[half:])
                  for k, v in marg.items()}
    return images, mu, sigma, floor, marg, marg_floor


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--sde", default="vpsde", choices=sorted(_SDES))
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--ch-mult", type=lambda s: tuple(
        int(x) for x in s.split(",")), default=(1, 2, 2, 2))
    p.add_argument("--num-res-blocks", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--num", type=int, default=4096)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--micro", type=int, default=64)
    p.add_argument("--feat-batch", type=int, default=256)
    p.add_argument("--eval-n", type=int, default=10_000)
    p.add_argument("--seed", type=int, default=888)
    p.add_argument("--inception", default=None,
                   help="pt_inception .pth (random-init features if absent)")
    p.add_argument("--features", default="inception",
                   choices=("inception", "toy"),
                   help="'toy' = small random-conv extractor (CI smoke)")
    p.add_argument("--snapshots", type=int, nargs="*", default=None,
                   help="specific snapshot steps (default: all + step 0)")
    p.add_argument("--out", default=None)
    p.add_argument("--grid-dir", default=None)
    args = p.parse_args(argv)

    out = args.out or os.path.join(args.workdir, "roundtrip.csv")
    grid_dir = args.grid_dir or os.path.join(args.workdir, "grids")
    os.makedirs(grid_dir, exist_ok=True)

    if args.features == "toy":
        feature_fn, feat_prov = toy_feature_fn(), "toy-conv"
    else:
        feature_fn = default_feature_fn(args.inception)
        feat_prov = "converted" if args.inception else "random-init"
    print("dataset side (features: %s) ..." % feat_prov, flush=True)
    _, mu, sigma, floor, marg, marg_floor = dataset_side(args, feature_fn)
    print(f"eval floor: split-half FID {floor:.4f}; W1 floors " +
          " ".join(f"{k}={v:.4f}" for k, v in marg_floor.items()),
          flush=True)

    # TrainState template exactly as apps/train.py builds it
    model = NCSNpp(config=NCSNppConfig(
        nf=args.nf, ch_mult=tuple(args.ch_mult),
        num_res_blocks=args.num_res_blocks))
    params0 = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros(1))["params"])(jax.random.PRNGKey(42))
    init_fn, _ = make_train_step(_SDES[args.sde](), lambda p_, x, t: None)
    template = jax.jit(init_fn)(params0)

    snaps = args.snapshots
    if snaps is None:
        snaps = sorted(int(os.path.basename(d).split("_")[1]) for d in
                       glob.glob(os.path.join(
                           args.workdir, "checkpoints", "checkpoint_*")))
        snaps = [0] + snaps                     # random init = the baseline
    mesh = make_mesh()
    run = make_sampler(params0, model, registry.derive("ddpm", args.steps),
                       batch=args.batch, micro=args.micro, mesh=mesh)

    rows = []

    def sink():
        with open(out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

    ndev = mesh.devices.size
    for s in snaps:
        if s == 0:
            ema = params0
        else:
            path = os.path.join(args.workdir, "checkpoints",
                                f"checkpoint_{s}")
            state = ckpt.restore(path, template)
            if int(jax.device_get(state.step)) == 0:
                print(f"snapshot {s}: restore failed, skipping")
                continue
            ema = state.ema.shadow
        key = jax.random.PRNGKey(args.seed)
        images, t0, done, first = [], None, 0, 0
        while done < args.num:
            b = min(args.batch, args.num - done)
            pad = -b % ndev
            key, k1, k2 = jax.random.split(key, 3)
            init = jax.random.normal(k1, (b + pad, 32, 32, 3), jnp.float32)
            init = jax.device_put(init, batch_sharding(mesh, 4))
            imgs = run(init, k2, params=ema)
            images.append(np.asarray(imgs, np.float32)[:b])
            if t0 is None:                       # first batch pays compile
                t0, first = time.time(), done + b
            done += b
        wall = time.time() - t0
        images = np.concatenate(images)[:args.num]
        rate = (done - first) / max(wall, 1e-9) if done > first else 0.0

        imgs01 = np.clip((images + 1.0) / 2.0, 0.0, 1.0)
        feats = activations(imgs01, feature_fn, batch_size=args.feat_batch)
        fid = frechet_distance(*compute_statistics(feats), mu, sigma)
        stats = summary_stats(imgs01)
        row = {"step": s, "features": feat_prov, "weights": "ema",
               "num": args.num, "ni_steps": args.steps,
               "fid": round(fid, 4), "fid_floor": round(floor, 4)}
        for k in stats:
            row[f"w1_{k}"] = round(wasserstein1(stats[k], marg[k]), 5)
            row[f"w1_{k}_floor"] = round(marg_floor[k], 5)
        row["finite"] = bool(np.isfinite(images).all())
        row["img_per_sec"] = round(rate, 1)
        rows.append(row)
        print(row, flush=True)
        sink()
        save_image_grid(images[:64],
                        os.path.join(grid_dir, f"step_{s}.png"))
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
