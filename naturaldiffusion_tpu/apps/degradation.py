"""Weighted-sum degradation study (paper §3.2) —
``src/AnalyzeWeightedSumDegradation.py:93-232`` rebuilt on jax.

For a feature set X = {x0_i} and a noisy sample x_t = alpha_t x0_i + noise,
compute the posterior p(x0_j | x_t) ∝ exp(-||x_t - x0_j||^2 / (2 sigma_rho^2))
over the whole set (sigma_rho = sqrt((1-abar)/abar), the rho
parameterisation) and record how concentrated it is on the sample's own x0 —
the "degradation of the weighted-sum denoiser target" evidence.

The reference reads VAE-encoded ImageNet latents from disk ("to do: specify
the feature path"); pass ``--features feats.npz`` (array ``feats`` of
[n, dim]) to reproduce that, or omit it for a synthetic Gaussian feature set
(the statistic's shape is data-agnostic).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def posterior_stats(feats: jnp.ndarray, t_index: int, *, kind: str = "vp",
                    seed: int = 200):
    """Returns (diag_probs [n], max_probs [n]) at schedule index ``t_index``."""
    n = feats.shape[0]
    feats = feats.reshape(n, -1).astype(jnp.float32)

    if kind == "vp":
        betas = np.linspace(1e-4, 0.02, 1000)
        abar = np.cumprod(1.0 - betas)
        scale = np.sqrt(abar[t_index])
        noise_scale = np.sqrt(1.0 - abar[t_index])
        sigma = np.sqrt((1.0 - abar[t_index]) / abar[t_index])
    elif kind == "flow":
        data_scales = np.linspace(1.0, 1e-5, 1000)
        scale = data_scales[t_index]
        noise_scale = 1.0 - data_scales[t_index]
        sigma = (1.0 - data_scales[t_index]) / data_scales[t_index]
    else:
        raise ValueError(kind)

    noise = jax.random.normal(jax.random.PRNGKey(seed), feats.shape)
    samples = feats * scale + noise * noise_scale

    # ||s_i - f_j||^2 via the Gram trick (the reference uses torch.cdist)
    s2 = jnp.sum(samples ** 2, axis=1, keepdims=True)
    f2 = jnp.sum(feats ** 2, axis=1)[None, :]
    d2 = s2 + f2 - 2.0 * samples @ feats.T
    logits = (-d2 / (2.0 * sigma ** 2)).astype(jnp.float64)
    probs = jax.nn.softmax(logits, axis=1)
    return jnp.diagonal(probs), probs.max(axis=1)


def run_study(feats, t_indices, kind: str, outdir: str | None) -> None:
    for t in t_indices:
        diag, mx = posterior_stats(jnp.asarray(feats), t, kind=kind)
        diag, mx = np.asarray(diag), np.asarray(mx)
        conc = (diag > 0.9).mean()
        print(f"{kind} t={t:<4d} own-x0 mass mean={diag.mean():.4f} "
              f"P(own>0.9)={conc:.4f} max-prob mean={mx.mean():.4f}")
        if outdir:
            hist_x0, _ = np.histogram(diag, bins=100, range=(0, 1))
            hist_xx, _ = np.histogram(mx, bins=100, range=(0, 1))
            os.makedirs(outdir, exist_ok=True)
            np.savez(os.path.join(outdir, f"{kind}_{t}.npz"),
                     hist_x0=hist_x0, hist_xx=hist_xx)


def features_from_images(data_dir: str, *, vae_ckpt: str | None = None,
                         image_size: int = 256, batch: int = 16,
                         limit: int = 512) -> np.ndarray:
    """VAE-encode an image folder to flattened latent-mean features — the
    reference's ``get_feature``/``get_batch_feature_tx``
    (``src/AnalyzeWeightedSumDegradation.py:37-90``: AutoencoderKL encode,
    posterior mean, flatten)."""
    import jax
    import jax.numpy as jnp

    from ..data.image_folder import list_images, preprocess_image
    from ..models.vae import AutoencoderKL, SD_VAE, vae_torch_path_map
    from PIL import Image

    model = AutoencoderKL(config=SD_VAE)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, image_size, image_size, 3)))["params"]
    if vae_ckpt:
        from ..models.convert import fill_from_torch, load_torch_checkpoint
        params, _ = fill_from_torch(params, load_torch_checkpoint(vae_ckpt),
                                    path_map=vae_torch_path_map)

    encode = jax.jit(lambda x: model.apply(
        {"params": params}, x, method=AutoencoderKL.encode)[0])

    files = list_images(data_dir)[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {data_dir!r}")
    feats = []
    for start in range(0, len(files), batch):
        imgs = []
        for f in files[start:start + batch]:
            with Image.open(f) as im:
                imgs.append(preprocess_image(im, image_size, "crop_resize"))
        x = jnp.asarray(np.stack(imgs)) * 2.0 - 1.0
        mean = encode(x)
        feats.append(np.asarray(mean, np.float32).reshape(len(imgs), -1))
    return np.concatenate(feats)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features", default=None,
                   help="npz with array 'feats' [n, dim]")
    p.add_argument("--images", default=None,
                   help="image directory to VAE-encode into features "
                        "(the reference's ImageNet path)")
    p.add_argument("--vae", default=None, help="converted VAE weights")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--limit", type=int, default=512)
    p.add_argument("--kind", choices=("vp", "flow"), default="vp")
    p.add_argument("--t", type=lambda s: [int(x) for x in s.split(",")],
                   default=[200, 300, 400, 500, 600, 700, 800, 900])
    p.add_argument("--outdir", default=None)
    p.add_argument("--n", type=int, default=512,
                   help="synthetic feature count (no --features/--images)")
    p.add_argument("--dim", type=int, default=256)
    args = p.parse_args(argv)

    if args.features:
        feats = np.load(args.features)["feats"]
    elif args.images:
        feats = features_from_images(args.images, vae_ckpt=args.vae,
                                     image_size=args.image_size,
                                     limit=args.limit)
        print(f"encoded {feats.shape[0]} images -> dim {feats.shape[1]}")
    else:
        feats = np.random.default_rng(0).standard_normal(
            (args.n, args.dim)).astype(np.float32)
    run_study(feats, args.t, args.kind, args.outdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
