"""Ring attention — sequence-parallel attention over the mesh.

SURVEY §2.5 lists ring attention as the stretch extension of SP: when the
token axis is sharded over ``model`` (MMDiT/DiT long-context), full
attention normally all-gathers K/V.  Ring attention keeps K/V sharded and
rotates the blocks around the ring with ``ppermute`` (one ICI hop per
step), accumulating the softmax online (log-sum-exp streaming, f32) — peak
memory O(T/n) per chip and the transfers overlap the block matmuls.

Pure ``shard_map`` + XLA collectives, so it runs (and is tested) on the
virtual 8-device CPU mesh like the rest of the parallelism stack; on real
hardware the ppermute rides ICI.  The Pallas RDMA variant (guide §Ring
Collectives) is a further step if ICI overlap ever becomes the bottleneck.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_block(q, k, v, sm_scale):
    """Scores + per-row (max, sumexp, weighted-V) for one K/V block."""
    s = jnp.einsum("bhqc,bhkc->bhqk", q, k).astype(jnp.float32) * sm_scale
    m = jnp.max(s, axis=-1)                              # [B,H,Tq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)                              # [B,H,Tq]
    o = jnp.einsum("bhqk,bhkc->bhqc", p.astype(v.dtype), v)
    return m, l, o.astype(jnp.float32)


def ring_mha(q, k, v, mesh: Mesh, *, axis: str = "model",
             sm_scale: float | None = None):
    """q/k/v: [B, H, T, D] with T sharded over ``axis``; returns [B,H,T,D]
    with the same sharding.  Full (non-causal) attention."""
    d = q.shape[-1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    n = mesh.shape[axis]
    spec = P(None, None, axis, None)

    def body(q, k, v):
        m, l, o = _local_block(q, k, v, sm_scale)

        def step(i, carry):
            k, v, m, l, o = carry
            perm = [(j, (j + 1) % n) for j in range(n)]
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            m2, l2, o2 = _local_block(q, k, v, sm_scale)
            m_new = jnp.maximum(m, m2)
            a = jnp.exp(m - m_new)
            b = jnp.exp(m2 - m_new)
            l = l * a + l2 * b
            o = o * a[..., None] + o2 * b[..., None]
            return k, v, m_new, l, o

        k, v, m, l, o = jax.lax.fori_loop(0, n - 1, step, (k, v, m, l, o))
        return (o / l[..., None]).astype(q.dtype)

    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    constrain = functools.partial(jax.lax.with_sharding_constraint)
    ns = NamedSharding(mesh, spec)
    return fn(constrain(q, ns), constrain(k, ns), constrain(v, ns))
