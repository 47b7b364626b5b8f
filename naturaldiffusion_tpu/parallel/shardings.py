"""Parameter/activation sharding rules (TP/SP) for the model families.

Strategy table (SURVEY.md §2.5):

* **DP** — batch dim over ``data``; parameters replicated.  Used for the
  FID-scale sampling sweeps and NCSN++ training (62M params fit per chip).
* **TP (Megatron-style)** — DiT/MMDiT attention heads + MLP hidden dim over
  ``model``: qkv/fc1 column-parallel, proj/fc2 row-parallel.  XLA inserts
  the all-reduces from the NamedSharding annotations.
* **SP** — token axis over ``model`` between blocks (constraint applied by
  the caller; XLA all-gathers into the TP matmuls).
* **PP / EP** — not applicable to these backbones (no MoE; depth fits on a
  chip) — explicitly out of scope, as in the reference (which has neither).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# flax param-path regex -> PartitionSpec factory (by array ndim)
_DIT_TP_RULES: list[tuple[str, callable]] = [
    # column-parallel: output dim sharded
    (r".*/attn/qkv/kernel$",   lambda: P(None, "model")),
    (r".*/attn/qkv/bias$",     lambda: P("model")),
    (r".*/mlp/fc1/kernel$",    lambda: P(None, "model")),
    (r".*/mlp/fc1/bias$",      lambda: P("model")),
    # row-parallel: input dim sharded, output replicated (psum)
    (r".*/attn/proj/kernel$",  lambda: P("model", None)),
    (r".*/mlp/fc2/kernel$",    lambda: P("model", None)),
    # adaLN modulation: large [D, 6D] projections — column-parallel
    (r".*/adaLN_modulation_1/kernel$", lambda: P(None, "model")),
    (r".*/adaLN_modulation_1/bias$",   lambda: P("model")),
]


def _path_str(keypath) -> str:
    return "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                    for k in keypath)


def dit_tp_sharding(params, mesh: Mesh):
    """NamedSharding pytree for DiT params: Megatron TP over ``model``;
    everything unmatched is replicated."""
    def spec_for(keypath, leaf):
        path = _path_str(keypath)
        for pat, spec in _DIT_TP_RULES:
            if re.match(pat, path):
                return NamedSharding(mesh, spec())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicate_tree(params, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)


def constrain_tokens(tok, mesh: Mesh, *, data_axis="data", seq_axis="model"):
    """Megatron-SP boundary constraint: [B, T, D] sharded (data, model, -)."""
    return jax.lax.with_sharding_constraint(
        tok, NamedSharding(mesh, P(data_axis, seq_axis, None)))
