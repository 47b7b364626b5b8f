"""DiT ImageNet-256 NI validation — ``src/ValidateNaturalInference.py``'s
execution half on the Flax DiT.

Runs (a) the original skip-sampling recursion (DDPM ancestral or DDIM) and
(b) Natural Inference with the corresponding coefficient matrix, from the
same seed and CFG wrapper, and reports the max latent difference — the
reference's "You'll observe that there is no difference" check
(``:375-391``), made numerical.  With ``--ckpt``/``--vae`` it decodes both
trajectories to images like the reference's
``results/validation/{alg}_{steps}__seed_{s}__{original,natural}.png``.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..coeffs import registry
from ..engine import NISchedule, natural_inference
from ..models.dit import DiT, DIT_CONFIGS, DiTConfig, forward_with_cfg
from ..schedules import DiscreteVP


def build_model(args):
    if args.small:
        cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                        hidden_size=64, depth=2, num_heads=4,
                        num_classes=10)
    else:
        cfg = DIT_CONFIGS[args.model]
    model = DiT(config=cfg)
    x0 = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.in_channels))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros(1),
                        jnp.zeros(1, jnp.int32))["params"]
    if args.ckpt:
        from ..models.convert import (fill_from_torch,
                                      load_torch_checkpoint)
        from ..models.dit import dit_torch_path_map
        params, unused = fill_from_torch(
            params, load_torch_checkpoint(args.ckpt),
            path_map=dit_torch_path_map)
        print(f"loaded {args.ckpt} ({len(unused)} unused keys)")
    else:
        # adaLN-Zero leaves the output 0 at init; perturb so the
        # validation actually exercises the network
        key = jax.random.PRNGKey(7)
        params = jax.tree.map(
            lambda p: p + 0.02 * jax.random.normal(key, p.shape)
            if p.ndim >= 2 and float(jnp.abs(p).sum()) == 0.0 else p,
            params)
    return model, cfg, params


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--alg", choices=("ddpm", "ddim"), default="ddim")
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--model", default="DiT-XL/2")
    p.add_argument("--ckpt", default=None, help="DiT-XL-2-256x256.pt")
    p.add_argument("--vae", default=None)
    p.add_argument("--small", action="store_true",
                   help="tiny random DiT (smoke mode)")
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol", type=float, default=1e-3)
    args = p.parse_args(argv)

    model, cfg, params = build_model(args)
    n = args.steps
    b = args.batch
    key = jax.random.PRNGKey(args.seed)
    k_init, k_lab = jax.random.split(key)
    init = jax.random.normal(
        k_init, (2 * b, cfg.input_size, cfg.input_size, cfg.in_channels),
        jnp.float32)
    labels = jax.random.randint(k_lab, (b,), 0, cfg.num_classes)
    # the reference CFG convention: first half conditional labels, second
    # half the null token (src/ValidateNaturalInference.py:343-344)
    y = jnp.concatenate([labels, jnp.full((b,), cfg.num_classes)])

    def eps_fn(z, t):
        tb = jnp.full((z.shape[0],), t, jnp.float32)
        out = forward_with_cfg(
            lambda xx, tt, yy: model.apply({"params": params}, xx, tt, yy),
            z, tb, y, args.cfg_scale, cfg.in_channels)
        return out[..., :cfg.in_channels]       # drop learned sigma

    # (a) direct skip-sampling over the respaced discrete grid
    sch = DiscreteVP.create(n)
    ts = sch.timesteps[::-1].astype(np.float64)
    if args.alg == "ddim":
        c_xt, c_x0 = sch.ddim_coeff_xt[::-1], sch.ddim_coeff_x0[::-1]
        stds = np.zeros(n)
    else:
        c_xt, c_x0 = sch.ddpm_coeff_xt[::-1], sch.ddpm_coeff_x0[::-1]
        stds = sch.posterior_std[::-1]
    ab = sch.alphas_bar[::-1]
    noises = jax.random.normal(jax.random.fold_in(key, 1),
                               (n,) + init.shape, jnp.float32)

    z = init
    for k in range(n):
        eps = eps_fn(z, float(ts[k]))
        x0 = (z - np.sqrt(1 - ab[k]) * eps) / np.sqrt(ab[k])
        z = c_xt[k] * z + c_x0[k] * x0 + stds[k] * noises[k]
    direct = z

    # (b) Natural Inference with the derived matrix, same seed
    m = registry.derive(args.alg, n)
    sched = NISchedule.from_matrix(m)
    ni = natural_inference(eps_fn, sched, init,
                           noises=None if args.alg == "ddim" else noises,
                           prediction_type="eps")

    diff = float(jnp.abs(jnp.asarray(direct) - ni).max())
    scale = float(jnp.abs(ni).max())
    status = "OK " if diff < args.tol * max(scale, 1.0) else "FAIL"
    print(f"[{status}] DiT {args.alg} steps={n} cfg={args.cfg_scale} "
          f"max|original - NI| = {diff:.3e} (latent scale {scale:.2f})")

    if args.vae:
        from ..models.vae import AutoencoderKL, SD_VAE, vae_torch_path_map
        from ..models.convert import fill_from_torch, load_torch_checkpoint
        from ..utils.plotting import save_image_grid
        vae = AutoencoderKL(config=SD_VAE)
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"]
        vp, _ = fill_from_torch(vp, load_torch_checkpoint(args.vae),
                                path_map=vae_torch_path_map)
        for name, lat in (("original", direct), ("natural", ni)):
            img = vae.apply({"params": vp},
                            vae.unscale_latents(jnp.asarray(lat[:b])),
                            method=AutoencoderKL.decode)
            save_image_grid(np.asarray(img),
                            f"results/validation/{args.alg}_{n:03d}__seed_"
                            f"{args.seed}__{name}.png", nrow=b)
    return 0 if diff < args.tol * max(scale, 1.0) else 1


if __name__ == "__main__":
    sys.exit(main())
