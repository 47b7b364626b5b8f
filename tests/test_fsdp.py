"""FSDP/ZeRO-3 sharded training state (``parallel.fsdp_sharding``).

The reference's only parallelism is ``torch.nn.DataParallel`` (replicated
params); this is the TPU-native capability beyond it: the whole TrainState
(params, Adam moments, EMA shadow) sharded over the data axis, XLA inserting
the all-gather/reduce-scatter collectives from annotations alone.

Checks on the 8-device virtual CPU mesh: sharding rules (largest divisible
dim, scalars replicated), per-device state bytes ~1/8 of the replicated
state, and a sharded train step == the replicated step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.parallel import (fsdp_sharding, make_mesh,
                                           shard_batch)


def _tiny_model_and_state():
    from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
    from naturaldiffusion_tpu.sde import VPSDE
    from naturaldiffusion_tpu.train import make_train_step

    cfg = NCSNppConfig(image_size=16, num_channels=3, nf=32, ch_mult=(1, 2),
                       num_res_blocks=1, attn_resolutions=(8,), dropout=0.0)
    model = NCSNpp(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)), jnp.zeros(1))["params"]
    init_fn, step_fn = make_train_step(
        VPSDE(), lambda p, x, t: model.apply({"params": p}, x, t), warmup=10)
    return init_fn(params), step_fn


def test_fsdp_spec_rules():
    mesh = make_mesh({"data": 8})
    tree = {
        "big2d": jnp.zeros((256, 384)),        # both dims divisible; 384 wins
        "conv": jnp.zeros((3, 3, 64, 128)),    # largest divisible dim = 128
        "odd": jnp.zeros((129, 257)),          # nothing divides 8 -> replicated
        "small": jnp.zeros((8, 8)),            # under min_size -> replicated
        "scalar": jnp.zeros(()),
    }
    sh = fsdp_sharding(tree, mesh, min_size=2 ** 10)
    assert sh["big2d"].spec == jax.sharding.PartitionSpec(None, "data")
    assert sh["conv"].spec == jax.sharding.PartitionSpec(
        None, None, None, "data")
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()


def test_fsdp_state_bytes_drop():
    mesh = make_mesh({"data": 8})
    state, _ = _tiny_model_and_state()
    sh = fsdp_sharding(state, mesh, min_size=2 ** 10)
    sharded = jax.device_put(state, sh)

    def local_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if not hasattr(leaf, "addressable_shards"):   # python scalars
                continue
            shard = leaf.addressable_shards[0]
            total += shard.data.size * shard.data.dtype.itemsize
        return total

    full = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(state)
               if hasattr(l, "dtype"))
    per_dev = local_bytes(sharded)
    # params + 2 Adam moments + EMA shadow dominate; small/indivisible
    # leaves stay replicated so the drop is near-8x, not exactly 8x
    assert per_dev < full / 5, (per_dev, full)


def test_fsdp_step_matches_replicated():
    mesh = make_mesh({"data": 8})
    state, step_fn = _tiny_model_and_state()
    key = jax.random.PRNGKey(1)
    batch = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 16, 3))

    want_state, want_loss = jax.jit(step_fn)(state, key, batch)

    sh = fsdp_sharding(state, mesh, min_size=2 ** 10)
    sharded = jax.device_put(state, sh)
    sb = shard_batch(mesh, batch)
    got_state, got_loss = jax.jit(step_fn, out_shardings=(sh, None))(
        sharded, key, sb)

    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=0, atol=1e-5)
    for a, b in zip(jax.tree.leaves(got_state.params),
                    jax.tree.leaves(want_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)
    # the carried state really is sharded (first big param leaf)
    big = [l for l in jax.tree.leaves(got_state.params) if l.size >= 2 ** 10]
    assert any(not s.sharding.is_fully_replicated for s in big)
