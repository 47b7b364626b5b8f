"""The reference's LEARNED NI weight matrices load and drive the engine.

BASELINE.md's FID table is produced with learned weight matrices
(``weights/step_{5,10,15}_weight_*.npz`` — ``src/CIFAR10NaturalInference.py:246``),
not derived ones; their npz layout stores ``eps`` as ``[n, n]`` (deterministic,
initial-noise column only) where derived matrices store ``[n, n+1]``.  These
tests pin, against the actual reference artifacts when present:

* `CoeffMatrix.load` handles the learned layout (eps column padding),
* the natural-property marginals hold (row-sum(x0) ~ alpha_t, ||eps|| ~ sigma_t),
* a full `natural_inference` run executes on each learned matrix.

The SD3 learned CSVs are covered in ``test_sd3_ni.py``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.coeffs.matrix import CoeffMatrix
from naturaldiffusion_tpu.engine import NISchedule, natural_inference

REF_W = "/root/reference/weights"
LEARNED = ["step_5_weight_00.npz", "step_10_weight_42.npz",
           "step_15_weight_173.npz"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_W), reason="reference weights/ not present")


@pytest.mark.parametrize("fname", LEARNED)
def test_learned_matrix_loads_and_is_natural(fname):
    n = int(fname.split("_")[1])
    m = CoeffMatrix.load(os.path.join(REF_W, fname))
    assert m.x0.shape == (n, n)
    assert m.eps.shape == (n, n + 1)          # padded injected-noise column
    assert m.node.shape == (n + 1, 3)
    assert np.all(m.eps[:, 1:] == 0.0)        # deterministic: initial only
    # natural property: learned matrices track the ideal marginals loosely
    # (they are OPTIMIZED for FID, not constrained — the reference never
    # re-checks them post-training), so assert order-of-magnitude agreement
    # plus exactness at the final row, which the training pins.
    alpha, sigma = m.node[1:, 1], m.node[1:, 2]
    np.testing.assert_allclose(m.x0.sum(axis=1), alpha, atol=0.35)
    np.testing.assert_allclose(
        np.linalg.norm(m.eps, axis=1), sigma, atol=0.35)
    m.check_finite()


@pytest.mark.parametrize("fname", LEARNED)
def test_learned_matrix_drives_ni(fname):
    m = CoeffMatrix.load(os.path.join(REF_W, fname))
    sched = NISchedule.from_matrix(m)

    def eps_fn(z, t):
        # cheap stand-in model: a t-dependent contraction (shape-correct,
        # deterministic) — this pins the ENGINE path on the learned schedule
        return 0.1 * z * jnp.cos(jnp.asarray(t, z.dtype) / 1000.0)

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3), jnp.float32)
    out = jax.jit(lambda zz: natural_inference(
        eps_fn, sched, zz, prediction_type="eps"))(z)
    assert out.shape == z.shape
    assert np.all(np.isfinite(np.asarray(out)))
