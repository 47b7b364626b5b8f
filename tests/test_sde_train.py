"""SDE library, training step, EMA, parallel layer, and the driver contract
(__graft_entry__) on the 8-device virtual CPU mesh."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.sde import VPSDE, SubVPSDE, VESDE, get_score_fn
from naturaldiffusion_tpu.schedules import LinearVPSDE
from naturaldiffusion_tpu.train import EMA, make_train_step
from naturaldiffusion_tpu.parallel import (make_mesh, shard_batch,
                                           dit_tp_sharding)


def test_vpsde_matches_host_schedule():
    """jax VPSDE marginals == numpy LinearVPSDE (the deriver-side math)."""
    sde_j = VPSDE()
    sde_n = LinearVPSDE()
    t = np.linspace(1e-3, 1.0, 7)
    x = jnp.ones((7, 2, 2, 1))
    mean, std = sde_j.marginal_prob(x, jnp.asarray(t))
    a_n, s_n = sde_n.marginal_coeff(t)
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, 0], a_n, atol=1e-12)
    np.testing.assert_allclose(np.asarray(std), s_n, atol=1e-12)
    # drift/diffusion
    drift, diff = sde_j.sde(x, jnp.asarray(t))
    f_n, g_n = sde_n.sde_coeff(t)
    np.testing.assert_allclose(np.asarray(drift)[:, 0, 0, 0], f_n, atol=1e-12)
    np.testing.assert_allclose(np.asarray(diff), g_n, atol=1e-12)


def test_prior_logp_is_standard_normal():
    sde = VPSDE()
    z = jnp.zeros((3, 2, 2, 2))
    d = 8
    want = -d / 2 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(sde.prior_logp(z)), want, atol=1e-6)


def test_score_fn_label_convention():
    """VP continuous: model gets t*999 and score = -eps/std
    (deps/score_sde_pytorch/models/utils.py:145-151)."""
    sde = VPSDE()
    seen = {}

    def apply_fn(x, labels):
        seen["labels"] = labels
        return jnp.ones_like(x)

    score = get_score_fn(sde, apply_fn)(jnp.ones((2, 4)),
                                        jnp.asarray([0.5, 1.0]))
    np.testing.assert_allclose(np.asarray(seen["labels"]), [499.5, 999.0])
    _, std = sde.marginal_prob(jnp.zeros((2, 4)), jnp.asarray([0.5, 1.0]))
    want = np.broadcast_to(-1.0 / np.asarray(std)[:, None], (2, 4))
    np.testing.assert_allclose(np.asarray(score), want, rtol=1e-6)


def test_ve_discrete_labels_rounded():
    """VE discrete: labels = round((T - t)(N-1)) (models/utils.py:168-171);
    without the round, float error + int truncation indexes sigma[i-1]."""
    from naturaldiffusion_tpu.sde import VESDE
    sde = VESDE(N=10)
    seen = {}

    def apply_fn(x, labels):
        seen["labels"] = labels
        return x

    # a linspace-style grid whose products land just below integers in fp32
    t = jnp.asarray([1.0 - 3.0 / 9.0, 1.0 - 7.0 / 9.0, 1.0])
    get_score_fn(sde, apply_fn, continuous=False)(jnp.ones((3, 4)), t)
    labels = np.asarray(seen["labels"])
    np.testing.assert_array_equal(labels.astype(np.int32), [3, 7, 0])
    np.testing.assert_allclose(labels, np.round(labels))  # already integral


def test_ema_warmup_decay():
    p0 = {"w": jnp.zeros(3)}
    ema = EMA.create(p0, decay=0.9999)
    ema = ema.update({"w": jnp.ones(3)})
    # first update: decay = min(0.9999, 2/11)
    want = 1.0 - 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), want, rtol=1e-6)


def test_train_step_reduces_loss():
    """A linear score model on Gaussian data must improve within a few steps."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, labels):
            h = nn.Dense(16)(x.reshape(x.shape[0], -1))
            h = nn.tanh(h)
            return nn.Dense(x[0].size)(h).reshape(x.shape)

    model = Tiny()
    x0 = jnp.zeros((8, 4, 4, 1))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros(8))["params"]

    def apply_fn(p, x, labels):
        return model.apply({"params": p}, x, labels)

    init_fn, step_fn = make_train_step(VPSDE(), apply_fn, lr=1e-2, warmup=1)
    state = init_fn(params)
    step = jax.jit(step_fn)
    key = jax.random.PRNGKey(1)
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 1)) * 0.1
    losses = []
    for i in range(30):
        state, loss = step(state, jax.random.fold_in(key, i), batch)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert int(state.step) == 30
    assert int(state.ema.num_updates) == 30


def test_train_step_bf16_compute():
    """Mixed precision: bf16 fwd/bwd, but master params / Adam moments /
    EMA / loss all stay f32, and the first-step update tracks the f32
    step to bf16-grad tolerance."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, labels):
            h = nn.Dense(16)(x.reshape(x.shape[0], -1))
            h = nn.tanh(h)
            return nn.Dense(x[0].size)(h).reshape(x.shape)

    model = Tiny()
    x0 = jnp.zeros((8, 4, 4, 1))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros(8))["params"]

    def apply_fn(p, x, labels):
        return model.apply({"params": p}, x, labels)

    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 1)) * 0.1
    key = jax.random.PRNGKey(1)

    states, losses = {}, {}
    for tag, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        init_fn, step_fn = make_train_step(VPSDE(), apply_fn, lr=1e-2,
                                           warmup=1, compute_dtype=dt)
        st, loss = jax.jit(step_fn)(init_fn(params), key, batch)
        states[tag], losses[tag] = st, float(loss)

    st = states["bf16"]
    for leaf in jax.tree.leaves(st.params) + jax.tree.leaves(st.ema.shadow):
        assert leaf.dtype == jnp.float32, leaf.dtype
    assert np.isfinite(losses["bf16"])
    np.testing.assert_allclose(losses["bf16"], losses["f32"],
                               rtol=0.05)
    for a, b in zip(jax.tree.leaves(states["f32"].params),
                    jax.tree.leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.05)


def test_mesh_and_batch_sharding():
    mesh = make_mesh({"data": 8})
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_dit_tp_sharding_rules():
    from naturaldiffusion_tpu.models.dit import DiT, DiTConfig
    mesh = make_mesh({"data": 4, "model": 2})
    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=3, hidden_size=32,
                    depth=1, num_heads=2, num_classes=10, learn_sigma=False,
                    class_dropout_prob=0.0)
    model = DiT(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
                        jnp.zeros(2), jnp.zeros(2, jnp.int32))["params"]
    sh = dit_tp_sharding(params, mesh)
    P = jax.sharding.PartitionSpec
    assert sh["blocks_0"]["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert sh["blocks_0"]["attn"]["proj"]["kernel"].spec == P("model", None)
    assert sh["blocks_0"]["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert sh["blocks_0"]["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert sh["t_embedder_mlp_0"]["kernel"].spec == P()
    # placement executes
    p = jax.device_put(params, sh)
    assert p["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec == \
        P(None, "model")


def _load_graft_entry():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8():
    """The driver contract: full sharded train step on an 8-device mesh."""
    mod = _load_graft_entry()
    mod.dryrun_multichip(8)


def test_entry_compiles_abstractly():
    mod = _load_graft_entry()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 32, 32, 8)
