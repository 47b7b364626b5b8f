"""Fused GroupNorm kernel: interpret-mode kernel == jnp twin == flax."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.ops.group_norm import (group_norm_pallas,
                                                 group_norm_reference)


@pytest.mark.parametrize("c,hw", [(128, 8), (256, 4), (384, 4)])
def test_reference_matches_flax(c, hw):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, hw, hw, c), jnp.float32)
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,))
    g = min(c // 4, 32)
    flax_gn = nn.GroupNorm(num_groups=g, epsilon=1e-6)
    want = flax_gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = group_norm_reference(x, scale, bias, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("with_eb", [False, True])
def test_kernel_matches_reference(dtype, act, with_eb):
    b, hw, c = 4, 8, 256
    g = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, c)).astype(dtype)
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,))
    eb = (jax.random.normal(jax.random.PRNGKey(3), (b, c)).astype(dtype)
          if with_eb else None)
    want = group_norm_reference(x, scale, bias, g, act=act, extra_bias=eb)
    got = group_norm_pallas(x, scale, bias, g, act=act, extra_bias=eb,
                            interpret=True)
    assert got.dtype == x.dtype
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


def test_kernel_blocks_batch():
    """Batch larger than one VMEM block still normalizes per-sample."""
    b, hw, c = 16, 16, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, c))
    scale = jnp.ones((c,))
    bias = jnp.zeros((c,))
    want = group_norm_reference(x, scale, bias, 32)
    got = group_norm_pallas(x, scale, bias, 32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_module_param_tree_matches_nn_groupnorm():
    """layers.GroupNorm keeps nn.GroupNorm's param names (converter
    compatibility)."""
    from naturaldiffusion_tpu.models.layers import GroupNorm
    x = jnp.zeros((2, 4, 4, 128))
    ours = GroupNorm(num_groups=32).init(jax.random.PRNGKey(0), x)["params"]
    theirs = nn.GroupNorm(num_groups=32).init(
        jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(ours) == jax.tree.structure(theirs)
    assert all(ours[k].shape == theirs[k].shape for k in theirs)


def test_channel_stats_formulation_matches_reference():
    """The two-stage per-channel stats path (the TPU default, r3) must be
    numerically equivalent to the 5-D reduce formulation."""
    import jax.numpy as jnp
    from naturaldiffusion_tpu.ops.group_norm import (group_norm_reference,
                                                     group_norm_xla_channel)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 256)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    for act in (None, "silu"):
        want = group_norm_reference(x, scale, bias, 32, act=act)
        got = group_norm_xla_channel(x, scale, bias, 32, act=act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
    # bf16 input: same dtype-in/dtype-out contract
    xb = x.astype(jnp.bfloat16)
    got = group_norm_xla_channel(xb, scale, bias, 32, act="silu")
    want = group_norm_reference(xb, scale, bias, 32, act="silu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)
