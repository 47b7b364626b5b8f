"""Torch checkpoint -> Flax parameter-tree converters.

The reference loads three kinds of pretrained weights (SURVEY.md §5
checkpoint row): score-SDE ``checkpoint_8.pth`` (NCSN++,
``src/CIFAR10NaturalInference.py:126,144``), ``DiT-XL-2-256x256.pt``
(``src/ValidateNaturalInference.py:226``), and HF safetensors (SD3).  This
module holds the generic name-and-transpose machinery; model-specific key
maps live next to each model.

Transpose conventions (torch -> flax):
  Conv2d  weight [O, I, kh, kw]  -> kernel [kh, kw, I, O]
  Linear  weight [O, I]          -> kernel [I, O]
  GroupNorm/LayerNorm weight     -> scale
  NIN.W [in, out], biases, embeddings: unchanged
"""

from __future__ import annotations

from typing import Mapping

import jax
import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):          # torch tensor, without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def strip_prefixes(state_dict: Mapping[str, object],
                   prefixes=("module.", "model.")) -> dict:
    """Drop DataParallel/EMA wrapper prefixes (reference wraps the model in
    ``torch.nn.DataParallel`` — ``models/utils.py:93``)."""
    out = {}
    for k, v in state_dict.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def _torch_leaf_and_transform(flax_path: tuple[str, ...], arr_ndim_hint=None):
    """Map a flax leaf name to (torch leaf name, transform fn)."""
    leaf = flax_path[-1]
    if leaf == "kernel":
        return "weight", lambda a: (a.transpose(2, 3, 1, 0) if a.ndim == 4
                                    else a.transpose(1, 0))
    if leaf == "scale":
        return "weight", lambda a: a
    if leaf == "weight":              # FIRConv2d raw weight, stays 4D
        return "weight", lambda a: (a.transpose(2, 3, 1, 0) if a.ndim == 4
                                    else a)
    if leaf == "embedding":           # flax nn.Embed <- torch nn.Embedding
        return "weight", lambda a: a
    return leaf, lambda a: a          # bias, W, b, ...


def fill_from_torch(flax_params, state_dict: Mapping[str, object],
                    path_map=None, root: str = "") -> tuple[dict, list[str]]:
    """Fill ``flax_params`` (a nested dict template, e.g. from ``init``) with
    values from a torch ``state_dict``.

    ``path_map(tuple_of_names) -> torch key prefix string`` converts a flax
    module path to the torch dotted path; the default joins names with ``.``
    and rewrites ``m{i}`` segments to ``all_modules.{i}`` (the NCSN++ flat
    walk).  Returns (filled tree, list of unused torch keys).
    """
    state_dict = {k: v for k, v in state_dict.items()}
    used = set()

    def default_path_map(path):
        parts = []
        for seg in path:
            if seg.startswith("m") and seg[1:].isdigit():
                parts.extend(["all_modules", seg[1:]])
            else:
                parts.append(seg)
        return ".".join(parts)

    pm = path_map or default_path_map

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    filled = {}
    for keypath, template in flat:
        path = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                     for k in keypath)
        torch_leaf, tf = _torch_leaf_and_transform(path)
        key = pm(path[:-1])
        key = f"{root}{key}.{torch_leaf}" if key else f"{root}{torch_leaf}"
        if key not in state_dict:
            raise KeyError(f"flax leaf {'/'.join(path)} -> missing torch key "
                           f"{key!r}")
        arr = tf(_to_numpy(state_dict[key]))
        if arr.shape != template.shape:
            raise ValueError(f"{key}: torch {arr.shape} vs flax "
                             f"{template.shape} at {'/'.join(path)}")
        filled[path] = arr.astype(np.asarray(template).dtype)
        used.add(key)

    tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(flax_params),
        [filled[tuple(getattr(k, "key", getattr(k, "name", str(k)))
                      for k in kp)] for kp, _ in flat])
    unused = [k for k in state_dict if k not in used]
    return tree, unused


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pth`` into a flat name->numpy dict (CPU, no grad).

    Handles the reference's training-state layout ``{model, ema, optimizer,
    step}`` (``deps/score_sde_pytorch/utils.py:7-28``): prefers the EMA
    shadow params when present, else ``model``."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "ema" in ckpt:
        ema = ckpt["ema"]
        if "shadow_params" in ema:     # ExponentialMovingAverage state
            # shadow_params follow model.parameters() order == the state_dict
            # order with BUFFERS removed (e.g. the 'sigmas' buffer NCSN++
            # registers first); shape-check each assignment
            model_sd = strip_prefixes(ckpt["model"])
            shadows = list(ema["shadow_params"])
            out = {}
            si = 0
            for k, v in model_sd.items():
                if k.split(".")[-1] in ("sigmas", "num_batches_tracked",
                                        "running_mean", "running_var"):
                    out[k] = _to_numpy(v)
                    continue
                p = shadows[si]
                if tuple(p.shape) != tuple(v.shape):
                    raise ValueError(
                        f"EMA shadow/param misalignment at {k}: "
                        f"{tuple(p.shape)} vs {tuple(v.shape)}")
                out[k] = _to_numpy(p)
                si += 1
            return out
        ckpt = ema
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: _to_numpy(v) for k, v in strip_prefixes(ckpt).items()}
