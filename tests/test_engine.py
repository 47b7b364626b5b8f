"""NI engine tests: scan loop vs oracle loop, NI vs direct samplers.

Mirrors the reference's validation mechanism (SURVEY.md §4.3): run the
original sampler recursion and Natural Inference from the same seed and
require identical outputs (``src/ValidateNaturalInference.py:375-382``).
Here the comparison is numerical (float64, atol 1e-8) instead of by eye.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.coeffs import registry
from naturaldiffusion_tpu.engine import (NISchedule, natural_inference,
                                         natural_inference_reference,
                                         classifier_free,
                                         classifier_free_two_pass,
                                         to_x0, from_x0)
from naturaldiffusion_tpu.samplers import direct

assert jax.config.jax_enable_x64  # set in conftest.py

SHAPE = (2, 8)   # tiny batch x features


def toy_x0_fn(x, t):
    """Nonlinear, t-dependent toy denoiser (same fn drives both paths)."""
    return jnp.tanh(x) * 0.5 + 0.01 * jnp.sin(t / 100.0) * x


def toy_x0_fn_tfree(x, t):
    """t-independent denoiser — used where NI node times carry the Heun
    disambiguation offset and exact equality requires t-insensitivity."""
    return jnp.tanh(x) * 0.5


def _run_ni(matrix, x0_fn, init, noises=None):
    sched = NISchedule.from_matrix(matrix, dtype=jnp.float64)
    return np.asarray(natural_inference(
        x0_fn, sched, jnp.asarray(init, jnp.float64),
        noises=None if noises is None else jnp.asarray(noises, jnp.float64),
        prediction_type="x0", accum_dtype=jnp.float64))


@pytest.fixture(scope="module")
def init():
    return np.random.default_rng(0).standard_normal(SHAPE)


def test_scan_matches_reference_loop_stochastic(init):
    n = 8
    m = registry.derive("ddpm", n)
    noises = np.random.default_rng(1).standard_normal((n,) + SHAPE)
    got = _run_ni(m, toy_x0_fn, init, noises)
    want = natural_inference_reference(
        lambda x, t: np.asarray(toy_x0_fn(jnp.asarray(x), t)),
        m, init, noises=noises, prediction_type="x0")
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_scan_matches_reference_loop_deterministic(init):
    m = registry.derive("ddim", 10)
    got = _run_ni(m, toy_x0_fn, init)
    want = natural_inference_reference(
        lambda x, t: np.asarray(toy_x0_fn(jnp.asarray(x), t)),
        m, init, prediction_type="x0")
    np.testing.assert_allclose(got, want, atol=1e-10)


# -- NI(matrix) == direct sampler recursion ---------------------------------


def test_ni_equals_direct_ddpm(init):
    n = 10
    noises = np.random.default_rng(2).standard_normal((n,) + SHAPE)
    ni = _run_ni(registry.derive("ddpm", n), toy_x0_fn, init, noises)
    dr = np.asarray(direct.ddpm_ancestral(toy_x0_fn, n, init, noises,
                                          dtype=jnp.float64))
    np.testing.assert_allclose(ni, dr, atol=1e-8)


def test_ni_equals_direct_ddim(init):
    n = 10
    ni = _run_ni(registry.derive("ddim", n), toy_x0_fn, init)
    dr = np.asarray(direct.ddim(toy_x0_fn, n, init, dtype=jnp.float64))
    np.testing.assert_allclose(ni, dr, atol=1e-8)


def test_ni_equals_direct_ode_euler(init):
    n = 12
    ni = _run_ni(registry.derive("ode_euler", n), toy_x0_fn, init)
    dr = np.asarray(direct.ode_euler(toy_x0_fn, n, init, dtype=jnp.float64))
    np.testing.assert_allclose(ni, dr, atol=1e-8)


def test_ni_equals_direct_sde_euler(init):
    n = 12
    noises = np.random.default_rng(3).standard_normal((n,) + SHAPE)
    ni = _run_ni(registry.derive("sde_euler", n), toy_x0_fn, init, noises)
    dr = np.asarray(direct.sde_euler(toy_x0_fn, n, init, noises,
                                     dtype=jnp.float64))
    np.testing.assert_allclose(ni, dr, atol=1e-8)


def test_ni_equals_direct_heun(init):
    n = 6
    ni = _run_ni(registry.derive("ode_heun", n), toy_x0_fn_tfree, init)
    dr = np.asarray(direct.ode_heun(toy_x0_fn_tfree, n, init,
                                    dtype=jnp.float64))
    np.testing.assert_allclose(ni, dr, atol=1e-8)


def test_ni_equals_direct_flow_euler(init):
    n = 10
    ni = _run_ni(registry.derive("flow_euler", n), toy_x0_fn, init)
    dr = np.asarray(direct.flow_euler(toy_x0_fn, n, init, dtype=jnp.float64))
    np.testing.assert_allclose(ni, dr, atol=1e-8)


# -- prediction conversions ---------------------------------------------------


@pytest.mark.parametrize("ptype", ["eps", "x0", "score", "v_flow", "v_vp"])
def test_prediction_roundtrip(ptype):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(SHAPE))
    x0 = jnp.asarray(rng.standard_normal(SHAPE))
    alpha, sigma = 0.8, 0.6
    pred = from_x0(x0, x, alpha, sigma, ptype)
    back = to_x0(pred, x, alpha, sigma, ptype, accum_dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=1e-10)


# -- CFG ----------------------------------------------------------------------


def test_cfg_fused_equals_two_pass():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((4, 8)))

    def model(x, t, c):
        return jnp.tanh(x) + c @ w

    cond = jnp.asarray(rng.standard_normal((2, 4)))
    uncond = jnp.zeros((2, 4))
    x = jnp.asarray(rng.standard_normal(SHAPE))
    fused = classifier_free(model, cond, uncond, 4.0)(x, 0.5)
    twop = classifier_free_two_pass(model, cond, uncond, 4.0)(x, 0.5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(twop), atol=1e-12)


def test_cfg_split_channels():
    def model(x, t, c):
        return x + c[:, :1]

    rng = np.random.default_rng(6)
    cond = jnp.ones((2, 1))
    uncond = jnp.zeros((2, 1))
    x = jnp.asarray(rng.standard_normal((2, 8)))
    out = classifier_free(model, cond, uncond, 3.0, split_channels=4)(x, 0.0)
    # guided channels: u + 3(c-u) = x + 3; passthrough: conditional = x + 1
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(x[:, :4]) + 3.0)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(x[:, 4:]) + 1.0)


def test_pallas_scan_path_matches(init):
    """The fused Pallas ring-buffer scan (interpret mode on CPU) must match
    both the plain scan and the unrolled path."""
    n = 12
    m = registry.derive("ddpm", n)
    sched = NISchedule.from_matrix(m)
    x32 = jnp.asarray(init, jnp.float32)
    noises = jnp.asarray(
        np.random.default_rng(9).standard_normal((n,) + SHAPE), jnp.float32)
    kw = dict(noises=noises, prediction_type="x0")
    a = natural_inference(toy_x0_fn, sched, x32, unroll=False,
                          use_pallas=False, **kw)
    b = natural_inference(toy_x0_fn, sched, x32, use_pallas=True, **kw)
    c = natural_inference(toy_x0_fn, sched, x32, unroll=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_scan_pallas_deterministic_schedule():
    """The Pallas scan path with a deterministic schedule (single eps
    column) — SD3's shape; regression for the negative-pad bug found by
    the on-TPU SD3 bench."""
    import jax
    from naturaldiffusion_tpu.coeffs import registry
    from naturaldiffusion_tpu.engine.ni import (NISchedule,
                                                natural_inference,
                                                _scan_pallas)  # noqa: F401

    m = registry.derive("ddim_analytic", 12)
    assert m.is_deterministic
    sched = NISchedule.from_matrix(m)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))

    def toy(zz, t):
        return 0.9 * zz

    want = natural_inference(toy, sched, z, prediction_type="x0",
                             unroll=True)
    got = natural_inference(toy, sched, z, prediction_type="x0",
                            unroll=False, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_step_inputs_threading_all_paths(init):
    """The engine's per-step aux pytree (``step_inputs``) reaches the model
    as the k-th slice on every execution path — unroll, XLA scan and the
    Pallas scan — matching a stateful host-loop oracle.  This is how the
    precomputed adaLN modulations ride the SD3 sampling scan."""
    n = 10
    m = registry.derive("ddim", n)
    gain = np.random.default_rng(2).uniform(0.5, 1.5, (n,))
    aux = {"gain": jnp.asarray(gain, jnp.float64)}

    def fn_aux(x, t, a):
        return toy_x0_fn(x, t) * a["gain"]

    # host oracle: the reference loop is sequential Python, so a counter
    # closure replays the per-step gain exactly
    counter = {"k": 0}

    def ref_fn(x, t):
        g = gain[counter["k"]]
        counter["k"] += 1
        return np.asarray(toy_x0_fn(jnp.asarray(x), t)) * g

    want = natural_inference_reference(ref_fn, m, init,
                                       prediction_type="x0")

    sched = NISchedule.from_matrix(m, dtype=jnp.float64)
    z = jnp.asarray(init, jnp.float64)
    kw = dict(prediction_type="x0", accum_dtype=jnp.float64,
              step_inputs=aux)
    got_unroll = natural_inference(fn_aux, sched, z, unroll=True, **kw)
    got_scan = natural_inference(fn_aux, sched, z, unroll=False,
                                 use_pallas=False, **kw)
    np.testing.assert_allclose(np.asarray(got_unroll), want, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_scan), want, atol=1e-10)

    # Pallas scan path (interpret on CPU) is f32-only
    sched32 = NISchedule.from_matrix(m, dtype=jnp.float32)
    got_pallas = natural_inference(
        fn_aux, sched32, jnp.asarray(init, jnp.float32),
        prediction_type="x0", accum_dtype=jnp.float32,
        step_inputs=jax.tree.map(lambda a: a.astype(jnp.float32), aux),
        unroll=False, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got_pallas), want,
                               atol=1e-4, rtol=1e-4)
