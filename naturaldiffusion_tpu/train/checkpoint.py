"""Checkpoint save/restore (orbax) with the reference's two-tier layout.

The reference keeps ``checkpoints-meta`` (overwritten every
``snapshot_freq_for_preemption`` steps, for preemption resume) and numbered
``checkpoints/checkpoint_N.pth`` snapshots
(``deps/score_sde_pytorch/run_lib.py:69-77,139-173``, ``utils.py:7-28``);
``restore`` tolerates a missing file with a warning.  Same protocol here on
orbax: ``meta/`` (single slot) + ``snapshots/<step>``.
"""

from __future__ import annotations

import logging
import os

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_meta(workdir: str, state) -> None:
    """Overwrite the preemption-resume slot."""
    path = os.path.join(_abs(workdir), "checkpoints-meta")
    with ocp.PyTreeCheckpointer() as ck:
        ck.save(path, jax.device_get(state), force=True)


def save_snapshot(workdir: str, state, step: int) -> str:
    path = os.path.join(_abs(workdir), "checkpoints", f"checkpoint_{step}")
    with ocp.PyTreeCheckpointer() as ck:
        ck.save(path, jax.device_get(state), force=True)
    return path


def restore(workdir_or_path: str, template):
    """Restore into ``template``'s structure; returns the template unchanged
    (with a warning) when no checkpoint exists — the reference behaviour
    (``utils.py:7-19``)."""
    path = _abs(workdir_or_path)
    meta = os.path.join(path, "checkpoints-meta")
    if os.path.isdir(meta):
        path = meta
    # a directory only counts as a checkpoint when orbax's metadata marker
    # is present; an existing-but-checkpoint-free dir (e.g. a fresh workdir
    # the caller already created) keeps the reference's warn-and-continue
    # contract, while a PARTIAL write (marker present, payload missing —
    # preemption mid-save) stays a loud error instead of silently
    # restarting training from step 0
    if not os.path.isdir(path) or not any(
            os.path.exists(os.path.join(path, m))
            for m in ("_METADATA", "_CHECKPOINT_METADATA", "checkpoint")):
        logging.warning("No checkpoint found at %s. Returned the same state "
                        "as input", path)
        return template
    with ocp.PyTreeCheckpointer() as ck:
        return ck.restore(path, item=template)


def latest_snapshot_step(workdir: str) -> int | None:
    d = os.path.join(_abs(workdir), "checkpoints")
    if not os.path.isdir(d):
        return None
    steps = [int(n.split("_")[1]) for n in os.listdir(d)
             if n.startswith("checkpoint_")]
    return max(steps) if steps else None
