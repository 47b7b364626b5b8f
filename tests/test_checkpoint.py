"""Orbax checkpoint two-tier protocol."""

import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.train import checkpoint as ckpt


def _state(v: float):
    return {"step": jnp.asarray(int(v)), "params": {"w": jnp.ones(3) * v}}


def test_meta_roundtrip(tmp_path):
    wd = str(tmp_path)
    ckpt.save_meta(wd, _state(2.0))
    out = ckpt.restore(wd, _state(0.0))
    np.testing.assert_allclose(np.asarray(out["params"]["w"]), 2.0)
    assert int(out["step"]) == 2


def test_restore_missing_warns_and_passes_through(tmp_path, caplog):
    out = ckpt.restore(str(tmp_path / "nope"), _state(7.0))
    np.testing.assert_allclose(np.asarray(out["params"]["w"]), 7.0)


def test_snapshots_and_latest(tmp_path):
    wd = str(tmp_path)
    ckpt.save_snapshot(wd, _state(1.0), 100)
    ckpt.save_snapshot(wd, _state(3.0), 300)
    assert ckpt.latest_snapshot_step(wd) == 300
    out = ckpt.restore(f"{wd}/checkpoints/checkpoint_300", _state(0.0))
    np.testing.assert_allclose(np.asarray(out["params"]["w"]), 3.0)


def test_meta_overwrite(tmp_path):
    wd = str(tmp_path)
    ckpt.save_meta(wd, _state(1.0))
    ckpt.save_meta(wd, _state(5.0))
    out = ckpt.restore(wd, _state(0.0))
    np.testing.assert_allclose(np.asarray(out["params"]["w"]), 5.0)


def test_restore_empty_existing_workdir_passes_through(tmp_path):
    """A workdir the caller already created (no checkpoint in it) keeps the
    reference's warn-and-continue contract."""
    wd = tmp_path / "run"
    wd.mkdir()
    (wd / "samples").mkdir()  # unrelated run artifacts
    out = ckpt.restore(str(wd), _state(4.0))
    np.testing.assert_allclose(np.asarray(out["params"]["w"]), 4.0)


def test_restore_corrupt_checkpoint_raises(tmp_path):
    """A PARTIAL write (metadata marker present, payload missing — i.e.
    preemption mid-save) must stay a loud error, not silently restart
    training from step 0."""
    import pytest

    wd = tmp_path / "run"
    meta = wd / "checkpoints-meta"
    meta.mkdir(parents=True)
    (meta / "_METADATA").write_text("{}")  # marker without payload
    with pytest.raises(Exception):
        ckpt.restore(str(wd), _state(0.0))
