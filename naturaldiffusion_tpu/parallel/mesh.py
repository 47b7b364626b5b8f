"""Device-mesh construction and sharding helpers.

This layer replaces the reference's only parallelism —
``torch.nn.DataParallel`` (``deps/score_sde_pytorch/models/utils.py:93``) —
with the TPU-native stack: a named ``jax.sharding.Mesh`` over ICI, XLA
collectives inserted by the compiler from ``NamedSharding`` annotations
(SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """``make_mesh({"data": 4, "model": 2})``; default: 1-D data mesh over
    all local devices."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == len(devices), (axes, len(devices))
    return Mesh(np.asarray(devices).reshape(shape), tuple(axes.keys()))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a host batch with dim-0 sharding over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim, axis)), tree)


def fold_in_shard(key, mesh: Mesh, axis: str = "data"):
    """Per-shard PRNG derivation for DP sampling sweeps (SURVEY.md §2.5):
    inside shard_map, fold the data-axis index into the key."""
    idx = jax.lax.axis_index(axis)
    return jax.random.fold_in(key, idx)
