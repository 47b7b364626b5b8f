"""Score-SDE training/eval driver — ``deps/score_sde_pytorch/{main,run_lib}.py``
as one TPU-native CLI.

    python -m naturaldiffusion_tpu.apps.train --workdir /tmp/run \\
        --mode train --sde vpsde --data-dir <cifar-10-batches-bin> \\
        --n-iters 1000

One jitted train step (DSM loss + Adam/warmup/clip + EMA), DP batch sharding
over all local devices, two-tier orbax checkpoints (preemption meta +
numbered snapshots), periodic EMA sampling snapshots through the PC sampler —
the reference's ``train()`` loop shape (``run_lib.py:47-173``).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_dataset, get_inverse_scaler
from ..models.ncsnpp import NCSNpp, NCSNppConfig
from ..parallel import make_mesh, shard_batch
from ..sde import VPSDE, SubVPSDE, VESDE, get_score_fn
from ..train import make_train_step
from ..train import checkpoint as ckpt
from ..samplers import get_pc_sampler
from ..utils.plotting import save_image_grid

_SDES = {"vpsde": (VPSDE, dict(predictor="euler_maruyama",
                               corrector="none")),
         "subvpsde": (SubVPSDE, dict(predictor="euler_maruyama",
                                     corrector="none")),
         "vesde": (VESDE, dict(predictor="reverse_diffusion",
                               corrector="langevin"))}


@dataclasses.dataclass
class TrainConfig:
    workdir: str = "workdir"
    sde: str = "vpsde"
    dataset: str = "cifar10"
    data_dir: str | None = None
    batch: int = 128
    n_iters: int = 1_300_001          # reference default
    lr: float = 2e-4
    warmup: int = 5000
    grad_clip: float = 1.0
    ema_decay: float = 0.9999
    log_freq: int = 50
    snapshot_freq: int = 50_000
    preemption_freq: int = 10_000     # snapshot_freq_for_preemption
    sample_at_snapshot: bool = True
    bpd: bool = False
    nf: int = 128
    ch_mult: tuple = (1, 2, 2, 2)
    num_res_blocks: int = 4
    bf16: bool = False                # mixed precision (f32 master state)
    seed: int = 42
    donate: bool = False
    fsdp: bool = False


def train(cfg: TrainConfig) -> None:
    sde_cls, pc_kw = _SDES[cfg.sde]
    sde = sde_cls()
    mesh = make_mesh()

    model = NCSNpp(config=NCSNppConfig(
        nf=cfg.nf, ch_mult=tuple(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks))
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(cfg.seed), x0,
                        jnp.zeros(1))["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"model: {n_params / 1e6:.1f}M params, devices: "
          f"{mesh.devices.size}")

    def apply_fn(p, x, labels):
        return model.apply({"params": p}, x, labels)

    init_fn, step_fn = make_train_step(
        sde, apply_fn, lr=cfg.lr, warmup=cfg.warmup,
        grad_clip=cfg.grad_clip,
        compute_dtype=jnp.bfloat16 if cfg.bf16 else None)
    state = init_fn(params)
    state = ckpt.restore(cfg.workdir, state)     # preemption resume
    start = int(jax.device_get(state.step))

    # donate the carried TrainState: params/opt/EMA buffers are reused in
    # place instead of doubling HBM peak.  Opt-in: standard TPU runtimes
    # support it, but the axon tunnel backend rejects donated executions
    # (INVALID_ARGUMENT at result fetch — found by the on-hardware smoke)
    donate = (0,) if cfg.donate else ()
    if cfg.fsdp:
        # ZeRO-3: shard the whole TrainState (params/moments/EMA) over the
        # data axis; XLA all-gathers params per step and reduce-scatters
        # the update.  Per-device state bytes drop ~mesh-size-fold.
        from ..parallel import fsdp_sharding
        shardings = fsdp_sharding(state, mesh)
        state = jax.device_put(state, shardings)
        step = jax.jit(step_fn, out_shardings=(shardings, None),
                       donate_argnums=donate)
    else:
        step = jax.jit(step_fn, donate_argnums=donate)
    it = get_dataset(cfg.dataset, cfg.batch, data_dir=cfg.data_dir)
    key = jax.random.PRNGKey(cfg.seed + 1)

    # TB-compatible scalars + metrics.jsonl (reference run_lib.py:60-62)
    from ..utils.metrics import MetricsWriter
    metrics = MetricsWriter(cfg.workdir)

    t0, last = time.time(), start
    for i in range(start, cfg.n_iters):
        images, _ = next(it)
        batch = shard_batch(mesh, jnp.asarray(images))
        state, loss = step(state, jax.random.fold_in(key, i), batch)

        if i % cfg.log_freq == 0:
            loss = float(loss)
            rate = (i - last) * cfg.batch / max(time.time() - t0, 1e-9)
            print(f"step {i:>8d} loss {loss:.5f} ({rate:.0f} img/s)")
            metrics.scalar("training_loss", loss, i)
            metrics.scalar("img_per_sec", rate, i)
            t0, last = time.time(), i
        if i and i % cfg.preemption_freq == 0:
            ckpt.save_meta(cfg.workdir, state)
        if i and i % cfg.snapshot_freq == 0:
            path = ckpt.save_snapshot(cfg.workdir, state, i)
            print(f"snapshot -> {path}")
            if cfg.sample_at_snapshot:
                _sample_snapshot(cfg, sde, model, state, pc_kw, i)
    ckpt.save_meta(cfg.workdir, state)
    metrics.close()


def _sample_snapshot(cfg, sde, model, state, pc_kw, step_i: int) -> None:
    """EMA-swapped sampling snapshot (reference ``run_lib.py:155-173``)."""
    score_fn = get_score_fn(
        sde, lambda x, tl: model.apply({"params": state.ema.shadow}, x, tl))
    sampler = jax.jit(get_pc_sampler(sde, score_fn, (64, 32, 32, 3),
                                     **pc_kw))
    x, _ = sampler(jax.random.PRNGKey(step_i))
    inv = get_inverse_scaler(True)
    save_image_grid(np.asarray(inv(x)), f"{cfg.workdir}/samples/iter_"
                    f"{step_i}.png", value_range=(0.0, 1.0))


def evaluate(cfg: TrainConfig) -> None:
    """Eval-split loss of the EMA parameters (``run_lib.py:175-240`` core)."""
    from ..train.losses import sde_loss_fn
    sde = _SDES[cfg.sde][0]()
    model = NCSNpp(config=NCSNppConfig(
        nf=cfg.nf, ch_mult=tuple(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros(1))["params"]
    init_fn, _ = make_train_step(sde, lambda p, x, t: model.apply(
        {"params": p}, x, t))
    state = ckpt.restore(cfg.workdir, init_fn(params))

    it = get_dataset(cfg.dataset, cfg.batch, data_dir=cfg.data_dir,
                     split="test")
    loss_fn = jax.jit(lambda p, k, b: sde_loss_fn(
        sde, lambda pp, x, t: model.apply({"params": pp}, x, t), p, k, b))
    losses = []
    for i in range(16):
        images, _ = next(it)
        losses.append(float(loss_fn(state.ema.shadow,
                                    jax.random.PRNGKey(i),
                                    jnp.asarray(images))))
    print(f"eval loss (EMA, {len(losses)} batches): {np.mean(losses):.5f}")

    if getattr(cfg, "bpd", False):
        # prob-flow ODE bits/dim (reference run_lib.py:241-260 BPD pass)
        from ..eval.likelihood import get_likelihood_fn
        from ..sde import get_score_fn
        score_fn = get_score_fn(sde, lambda x, tl: model.apply(
            {"params": state.ema.shadow}, x, tl))
        lik = get_likelihood_fn(sde, score_fn,
                                inverse_scaler=get_inverse_scaler(True))
        bpds = []
        for i in range(4):
            images, _ = next(it)
            bpd, _, nfe = lik(jax.random.PRNGKey(100 + i),
                              jnp.asarray(images))
            bpds.append(float(np.asarray(bpd).mean()))
            print(f"  bpd batch {i}: {bpds[-1]:.4f} (nfe {int(nfe)})")
        print(f"eval bpd (EMA, {len(bpds)} batches): {np.mean(bpds):.4f}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--mode", choices=("train", "eval"), default="train")
    p.add_argument("--sde", choices=sorted(_SDES), default="vpsde")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--n-iters", type=int, default=1_300_001)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup", type=int, default=5000)
    p.add_argument("--snapshot-freq", type=int, default=50_000)
    p.add_argument("--preemption-freq", type=int, default=10_000)
    p.add_argument("--log-freq", type=int, default=50)
    p.add_argument("--donate", action="store_true",
                   help="donate the TrainState buffers (halves HBM peak; "
                        "not supported by the axon tunnel backend)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params/optimizer/EMA over the data "
                        "axis (per-device state bytes drop ~n_devices-fold)")
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--ch-mult", type=lambda s: tuple(
        int(x) for x in s.split(",")), default=(1, 2, 2, 2))
    p.add_argument("--num-res-blocks", type=int, default=4)
    p.add_argument("--no-snapshot-samples", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 fwd/bwd with f32 master params/opt/EMA "
                        "(TPU mixed precision; default is the "
                        "reference's f32)")
    p.add_argument("--bpd", action="store_true",
                   help="also report prob-flow bits/dim in eval mode")
    args = p.parse_args(argv)

    cfg = TrainConfig(
        workdir=args.workdir, sde=args.sde, dataset=args.dataset,
        data_dir=args.data_dir, batch=args.batch, n_iters=args.n_iters,
        lr=args.lr, warmup=args.warmup, snapshot_freq=args.snapshot_freq,
        preemption_freq=args.preemption_freq, log_freq=args.log_freq,
        nf=args.nf, ch_mult=args.ch_mult,
        num_res_blocks=args.num_res_blocks,
        sample_at_snapshot=not args.no_snapshot_samples, bpd=args.bpd,
        bf16=args.bf16, donate=args.donate, fsdp=args.fsdp)
    (train if args.mode == "train" else evaluate)(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
