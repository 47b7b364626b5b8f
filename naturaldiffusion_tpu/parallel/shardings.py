"""Parameter/activation sharding rules (TP/SP) for the model families.

Strategy table (SURVEY.md §2.5):

* **DP** — batch dim over ``data``; parameters replicated.  Used for the
  FID-scale sampling sweeps and NCSN++ training (62M params fit per chip).
* **TP (Megatron-style)** — DiT/MMDiT attention heads + MLP hidden dim over
  ``model``: qkv/fc1 column-parallel, proj/fc2 row-parallel.  XLA inserts
  the all-reduces from the NamedSharding annotations.
* **SP** — token axis over ``model`` between blocks (constraint applied by
  the caller; XLA all-gathers into the TP matmuls).
* **FSDP (ZeRO-3)** — the whole TrainState sharded over ``data``
  (``fsdp_sharding``): per-device optimizer-state bytes drop ~mesh-size-fold.
* **PP / EP** — not applicable to these backbones (no MoE; depth fits on a
  chip) — explicitly out of scope, as in the reference (which has neither).
"""

from __future__ import annotations

import re
import warnings

import numpy as np

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

# MMDiT (SD3) — param names follow models/mmdit.py (HF layout mirrored):
# q/k/v + context q/k/v column-parallel (heads split over `model`), output
# projections row-parallel, both MLPs column->row, adaLN projections
# column-parallel.  2B params at SD3-medium scale: TP is the memory story.
_MMDIT_TP_RULES: list[tuple[str, callable]] = [
    (r".*/attn_to_[qkv]/kernel$",        lambda: P(None, "model")),
    (r".*/attn_to_[qkv]/bias$",          lambda: P("model")),
    (r".*/attn_add_[qkv]_proj/kernel$",  lambda: P(None, "model")),
    (r".*/attn_add_[qkv]_proj/bias$",    lambda: P("model")),
    (r".*/attn_to_out_0/kernel$",        lambda: P("model", None)),
    (r".*/attn_to_add_out/kernel$",      lambda: P("model", None)),
    (r".*/ff_net_0_proj/kernel$",        lambda: P(None, "model")),
    (r".*/ff_net_0_proj/bias$",          lambda: P("model")),
    (r".*/ff_net_2/kernel$",             lambda: P("model", None)),
    (r".*/ff_context_net_0_proj/kernel$", lambda: P(None, "model")),
    (r".*/ff_context_net_0_proj/bias$",  lambda: P("model")),
    (r".*/ff_context_net_2/kernel$",     lambda: P("model", None)),
    (r".*/norm1_linear/kernel$",         lambda: P(None, "model")),
    (r".*/norm1_linear/bias$",           lambda: P("model")),
    (r".*/norm1_context_linear/kernel$", lambda: P(None, "model")),
    (r".*/norm1_context_linear/bias$",   lambda: P("model")),
]


def _path_str(keypath) -> str:
    return "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                    for k in keypath)


def tp_sharding(params, mesh: Mesh, rules, *, family: str = "model"):
    """NamedSharding pytree from ``rules``; unmatched leaves replicated.
    Warns when NO leaf matches — a silent all-replicated result almost always
    means the rules were applied to the wrong model family."""
    matched = [0]

    def spec_for(keypath, leaf):
        path = _path_str(keypath)
        for pat, spec in rules:
            if re.match(pat, path):
                matched[0] += 1
                return NamedSharding(mesh, spec())
        return NamedSharding(mesh, P())

    out = jax.tree_util.tree_map_with_path(spec_for, params)
    if matched[0] == 0:
        warnings.warn(
            f"tp_sharding: zero {family} TP rules matched any parameter — "
            "the tree is fully replicated. Wrong model family for these "
            "rules?", stacklevel=2)
    return out


def dit_tp_sharding(params, mesh: Mesh):
    """Megatron TP for DiT params (see ``_DIT_TP_RULES``)."""
    return tp_sharding(params, mesh, _DIT_TP_RULES, family="DiT")


def mmdit_tp_sharding(params, mesh: Mesh):
    """Megatron TP for MMDiT/SD3 params (see ``_MMDIT_TP_RULES``)."""
    return tp_sharding(params, mesh, _MMDIT_TP_RULES, family="MMDiT")


def replicate_tree(params, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)


def fsdp_sharding(tree, mesh: Mesh, *, axis: str = "data",
                  min_size: int = 2 ** 14):
    """ZeRO-3-style fully-sharded sharding tree (params + optimizer moments
    + EMA alike): every leaf is sharded along its largest dimension that
    divides the ``axis`` size; scalars, small leaves (< ``min_size``
    elements — the all-gather latency isn't worth the bytes), and leaves
    with no divisible dim stay replicated.

    This is a capability the reference cannot express (its only parallelism
    is ``torch.nn.DataParallel``): per-device training-state bytes drop by
    ~the mesh size, and XLA inserts the all-gather (params, forward/backward)
    and reduce-scatter (grads/updates) collectives from the annotations
    alone.  Apply to a ``TrainState`` and pass as jit in/out shardings —
    see ``apps/train.py --fsdp``.
    """
    n = mesh.shape[axis]

    def spec_for(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        if not shape or int(np.prod(shape)) < min_size:
            return P()
        cands = [d for d in range(len(shape)) if shape[d] % n == 0]
        if not cands:
            return P()
        d = max(cands, key=lambda i: shape[i])
        spec = [None] * len(shape)
        spec[d] = axis
        return P(*spec)

    return jax.tree.map(lambda l: NamedSharding(mesh, spec_for(l)), tree)


def constrain_tokens(tok, mesh: Mesh, *, data_axis="data", seq_axis="model"):
    """Megatron-SP boundary constraint: [B, T, D] sharded (data, model, -)."""
    return jax.lax.with_sharding_constraint(
        tok, NamedSharding(mesh, P(data_axis, seq_axis, None)))
