"""Ring attention == full attention, token axis sharded over the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from naturaldiffusion_tpu.ops.attention import mha
from naturaldiffusion_tpu.ops.ring_attention import ring_mha
from naturaldiffusion_tpu.parallel import make_mesh


@pytest.mark.parametrize("t,ndev", [(64, 8), (48, 4)])
def test_ring_matches_full(t, ndev):
    mesh = make_mesh({"model": ndev}, jax.devices()[:ndev])
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, 4, t, 16), jnp.float32)
               for kk in ks)
    want = mha(q, k, v, backend="xla")
    got = jax.jit(lambda q, k, v: ring_mha(q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_output_stays_sequence_sharded():
    mesh = make_mesh({"model": 8}, jax.devices()[:8])
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 32, 8), jnp.float32)
               for kk in ks)
    out = jax.jit(lambda q, k, v: ring_mha(q, k, v, mesh))(q, k, v)
    spec = out.sharding.spec
    # trailing Nones may be normalized away
    assert tuple(spec)[:3] == (None, None, "model"), spec
    assert len(spec) < 4 or spec[3] is None, spec


def test_ring_numerics_large_logits():
    """Online log-sum-exp must survive large score magnitudes (the naive
    streaming sum overflows)."""
    mesh = make_mesh({"model": 4}, jax.devices()[:4])
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (20.0 * jax.random.normal(kk, (1, 1, 16, 8), jnp.float32)
               for kk in ks)
    want = mha(q, k, v, backend="xla")
    got = jax.jit(lambda q, k, v: ring_mha(q, k, v, mesh))(q, k, v)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)
