"""SD3-medium TP memory story at FULL parameter scale (VERDICT r2 weak #4):
AOT-lower the full-size MMDiT forward (hidden 1536, depth 24 — the 2.03B
SD3-medium trunk) with ``mmdit_tp_sharding`` on the virtual mesh, no weights
materialized, and check per-device parameter bytes halve on ``model=2``
vs the replicated lowering.

The latent grid is kept small (32x32 tokens instead of 128x128) — parameter
bytes, the quantity under test, are independent of sequence length, and the
full-sequence CPU compile would dominate suite time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from naturaldiffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
from naturaldiffusion_tpu.parallel import (make_mesh, mmdit_tp_sharding,
                                           batch_sharding)

FULL = MMDiTConfig(sample_size=32)     # SD3-medium trunk, small latent grid


def _param_avals(model, cfg, dtype=jnp.bfloat16):
    x = jnp.zeros((1, 32, 32, cfg.in_channels), dtype)
    shapes = jax.eval_shape(
        lambda k: model.init(k, x, jnp.zeros(1, jnp.float32),
                             jnp.zeros((1, 6, cfg.joint_attention_dim),
                                       dtype),
                             jnp.zeros((1, cfg.pooled_projection_dim),
                                       dtype))["params"],
        jax.random.PRNGKey(0))
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, dtype), shapes)


def _per_device_param_bytes(compiled, params_avals):
    """Per-device bytes of the parameter arguments, from the COMPILED
    executable's input shardings (falls back from memory_analysis, which the
    CPU backend does not populate)."""
    ma = None
    try:
        ma = compiled.memory_analysis()
    except Exception:
        pass
    if ma is not None and getattr(ma, "argument_size_in_bytes", 0):
        return ma.argument_size_in_bytes          # per-device on TPU

    shardings = compiled.input_shardings[0][0]    # params is arg 0
    leaves_s = jax.tree.leaves(shardings, is_leaf=lambda x: isinstance(
        x, jax.sharding.Sharding))
    leaves_a = jax.tree.leaves(params_avals)
    assert len(leaves_s) == len(leaves_a)
    total = 0
    for s, a in zip(leaves_s, leaves_a):
        shard_shape = s.shard_shape(a.shape)
        total += int(np.prod(shard_shape)) * a.dtype.itemsize
    return total


def test_sd3_medium_tp_halves_param_bytes():
    mesh = make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    tok_ns = NamedSharding(mesh, P("data", "model", None))
    model = MMDiT(config=FULL, token_constraint=tok_ns)

    params_avals = _param_avals(model, FULL)
    total_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                      for a in jax.tree.leaves(params_avals))
    n_params = total_bytes // 2                    # bf16
    assert 1.9e9 < n_params < 2.2e9, n_params      # the 2.03B trunk

    b = 8
    x_av = jax.ShapeDtypeStruct((b, 32, 32, FULL.in_channels), jnp.bfloat16)
    t_av = jax.ShapeDtypeStruct((b,), jnp.float32)
    c_av = jax.ShapeDtypeStruct((b, 6, FULL.joint_attention_dim),
                                jnp.bfloat16)
    p_av = jax.ShapeDtypeStruct((b, FULL.pooled_projection_dim), jnp.bfloat16)

    def fwd(p, xx, tt, cc, pp):
        return model.apply({"params": p}, xx, tt, cc, pp)

    data_sh = batch_sharding(mesh, 4)

    per_dev = {}
    for name, param_sh in (
            ("tp", mmdit_tp_sharding(params_avals, mesh)),
            ("replicated",
             jax.tree.map(lambda _: NamedSharding(mesh, P()), params_avals))):
        compiled = jax.jit(
            fwd, in_shardings=(param_sh, data_sh,
                               NamedSharding(mesh, P("data")),
                               batch_sharding(mesh, 3),
                               batch_sharding(mesh, 2)),
        ).lower(params_avals, x_av, t_av, c_av, p_av).compile()
        per_dev[name] = _per_device_param_bytes(compiled, params_avals)

    ratio = per_dev["replicated"] / per_dev["tp"]
    rep_gb, tp_gb = per_dev["replicated"] / 1e9, per_dev["tp"] / 1e9
    print(f"per-device param bytes: replicated={rep_gb:.3f}GB "
          f"tp={tp_gb:.3f}GB ratio={ratio:.3f}")
    # the TP rules cover the block kernels (~95% of the 2.03B); embeddings/
    # final layers stay replicated, so the drop is ~1.9x, not exactly 2x
    assert ratio > 1.8, (per_dev, ratio)
    # and the sharded side actually fits a 16GB v5e chip next to activations
    assert per_dev["tp"] < 2.4e9, per_dev
