"""MMDiT tensor/sequence parallelism on the virtual 8-device mesh.

VERDICT r1 item 3: TP rules must match MMDiT's real param names and actually
shard the qkv/ff kernels; a TP+SP forward must equal the replicated run.
(Capability match: SURVEY.md §2.5 — "shard DiT/MMDiT attention heads & MLP
hidden dim".)
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from naturaldiffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
from naturaldiffusion_tpu.parallel import (make_mesh, mmdit_tp_sharding,
                                           dit_tp_sharding, batch_sharding)

TINY = MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                   hidden_size=64, depth=2, num_heads=4,
                   caption_projection_dim=64, joint_attention_dim=32,
                   pooled_projection_dim=48, pos_embed_max_size=8)


def _inputs(b=4):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (b, 8, 8, 4), jnp.float32)
    t = jnp.linspace(0.1, 0.9, b)
    ctx = jax.random.normal(ks[1], (b, 6, 32), jnp.float32)
    pooled = jax.random.normal(ks[2], (b, 48), jnp.float32)
    return x, t, ctx, pooled


def test_tp_rules_match_qkv_and_ff():
    model = MMDiT(config=TINY)
    x, t, ctx, pooled = _inputs()
    params = model.init(jax.random.PRNGKey(1), x, t, ctx, pooled)["params"]
    mesh = make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    shard_tree = mmdit_tp_sharding(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(shard_tree)[0]
    by_path = {"/".join(getattr(k, "key", str(k)) for k in kp): s
               for kp, s in flat}
    sharded = {p for p, s in by_path.items() if s.spec != P()}
    # the hot kernels MUST be sharded
    for frag in ("attn_to_q/kernel", "attn_to_k/kernel", "attn_to_v/kernel",
                 "attn_add_q_proj/kernel", "attn_to_out_0/kernel",
                 "ff_net_0_proj/kernel", "ff_net_2/kernel",
                 "ff_context_net_0_proj/kernel", "norm1_linear/kernel"):
        assert any(frag in p for p in sharded), (frag, sorted(sharded)[:10])
    # column vs row orientation
    for p, s in by_path.items():
        if "attn_to_q/kernel" in p:
            assert s.spec == P(None, "model"), (p, s.spec)
        if "attn_to_out_0/kernel" in p:
            assert s.spec == P("model", None), (p, s.spec)


def test_wrong_family_warns():
    model = MMDiT(config=TINY)
    x, t, ctx, pooled = _inputs()
    params = model.init(jax.random.PRNGKey(1), x, t, ctx, pooled)["params"]
    mesh = make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    with pytest.warns(UserWarning, match="zero DiT TP rules"):
        dit_tp_sharding(params, mesh)


def test_tp_sp_forward_matches_replicated():
    mesh = make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    tok_ns = NamedSharding(mesh, P("data", "model", None))
    model_tp = MMDiT(config=TINY, token_constraint=tok_ns)
    model_rep = MMDiT(config=TINY)
    x, t, ctx, pooled = _inputs()
    params = model_rep.init(jax.random.PRNGKey(1), x, t, ctx, pooled)["params"]

    want = jax.jit(lambda p: model_rep.apply({"params": p}, x, t, ctx,
                                             pooled))(params)

    params_tp = jax.device_put(params, mmdit_tp_sharding(params, mesh))
    xs = jax.device_put(x, batch_sharding(mesh, 4))
    got = jax.jit(lambda p, xx: model_tp.apply({"params": p}, xx, t, ctx,
                                               pooled))(params_tp, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_tp_train_step_runs():
    """One sharded flow-matching train step on the mesh: grads flow through
    TP+SP shardings and stay finite."""
    import optax

    mesh = make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    tok_ns = NamedSharding(mesh, P("data", "model", None))
    model = MMDiT(config=TINY, token_constraint=tok_ns)
    x, t, ctx, pooled = _inputs()
    params = model.init(jax.random.PRNGKey(1), x, t, ctx, pooled)["params"]
    params = jax.device_put(params, mmdit_tp_sharding(params, mesh))
    opt = optax.adam(1e-4)
    opt_state = jax.jit(opt.init)(params)

    x1 = jax.device_put(x, batch_sharding(mesh, 4))
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def loss_fn(p):
        tt = jnp.full((x.shape[0],), 0.5)
        xt = 0.5 * x1 + 0.5 * noise
        v = model.apply({"params": p}, xt, tt, ctx, pooled)
        target = noise - x1          # rectified-flow velocity target
        return jnp.mean((v - target) ** 2)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
    params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
