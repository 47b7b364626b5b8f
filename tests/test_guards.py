"""NaN guards + metrics writer (VERDICT r1 item 8, SURVEY §5 sanitizers)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.coeffs import registry
from naturaldiffusion_tpu.coeffs.matrix import CoeffMatrix
from naturaldiffusion_tpu.engine import (NISchedule, natural_inference,
                                         natural_inference_checked)


def test_poisoned_matrix_raises():
    m = registry.derive("ddpm", 8)
    x0 = m.x0.copy()
    x0[3, 1] = np.nan
    poisoned = CoeffMatrix(x0=x0, eps=m.eps, node=m.node)
    with pytest.raises(FloatingPointError, match=r"x0 at \(3, 1\)"):
        poisoned.check_finite(context="test")


def test_registry_derive_is_guarded(monkeypatch):
    spec = registry.DERIVERS["ddpm"]
    bad = CoeffMatrix(x0=np.full((4, 4), np.nan), eps=np.zeros((4, 5)),
                      node=np.zeros((5, 3)))
    monkeypatch.setitem(registry.DERIVERS, "ddpm",
                        registry.DeriverSpec(lambda n: bad, spec.step_counts,
                                             spec.result_dir, spec.prefix))
    with pytest.raises(FloatingPointError, match="ddpm"):
        registry.derive("ddpm", 4)


def test_checked_engine_passes_clean():
    m = registry.derive("ddim_analytic", 6)
    sched = NISchedule.from_matrix(m)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    want = natural_inference(lambda z, t: 0.9 * z, sched, z,
                             prediction_type="x0")
    got = natural_inference_checked(lambda z, t: 0.9 * z, sched, z,
                                    prediction_type="x0")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_checked_engine_throws_on_nan_model():
    m = registry.derive("ddim_analytic", 6)
    sched = NISchedule.from_matrix(m)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))

    def bad_model(z, t):
        return z / 0.0 * 0.0           # inf * 0 -> NaN mid-trajectory

    with pytest.raises(Exception, match="nan|non-finite|division by zero"):
        natural_inference_checked(bad_model, sched, z, prediction_type="x0")


def test_metrics_writer(tmp_path):
    from naturaldiffusion_tpu.utils.metrics import MetricsWriter
    w = MetricsWriter(str(tmp_path))
    w.scalar("training_loss", 0.5, 0)
    w.scalar("training_loss", 0.25, 50)
    w.close()
    recs = [json.loads(l) for l in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert [r["value"] for r in recs] == [0.5, 0.25]
    assert [r["step"] for r in recs] == [0, 50]
    # TB event file written when tensorboardX is available
    import glob
    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))
