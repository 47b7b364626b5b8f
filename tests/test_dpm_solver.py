"""DPM-Solver execution engine tests.

The strongest anchor: the singlestep updates looped over the deriver's grid
must match Natural Inference with the derived coefficient matrices — which
are themselves regression-tested against the reference's golden npz corpus.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.coeffs import registry
from naturaldiffusion_tpu.engine import NISchedule, natural_inference
from naturaldiffusion_tpu.samplers.dpm_solver import (NoiseScheduleVP,
                                                      DPMSolver,
                                                      model_wrapper,
                                                      dynamic_thresholding)

SHAPE = (2, 8)


def toy_x0(x, t):
    return jnp.tanh(x) * 0.5


def _eps_model(ns):
    """Noise-prediction fn derived from the toy x0 predictor."""
    def eps(x, t_cont):
        alpha = ns.marginal_alpha(t_cont)
        sigma = ns.marginal_std(t_cont)
        return (x - alpha.reshape(-1, *([1] * (x.ndim - 1))) * toy_x0(x, t_cont)) \
            / sigma.reshape(-1, *([1] * (x.ndim - 1)))
    return eps


@pytest.fixture(scope="module")
def ns():
    return NoiseScheduleVP(schedule="linear")


@pytest.fixture(scope="module")
def init():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal(SHAPE), jnp.float64)


def test_lambda_roundtrip(ns):
    t = jnp.linspace(1e-3, 1.0, 11)
    lam = ns.marginal_lambda(t)
    back = ns.inverse_lambda(lam)
    np.testing.assert_allclose(np.asarray(back), np.asarray(t), atol=1e-10)


def test_discrete_schedule_tracks_continuous(ns):
    betas = np.linspace(0.1 / 1000, 20.0 / 1000, 1000)
    d = NoiseScheduleVP.discrete(betas=betas)
    t = jnp.linspace(0.05, 1.0, 7)
    a_c = np.asarray(ns.marginal_alpha(t))
    a_d = np.asarray(d.marginal_alpha(t))
    np.testing.assert_allclose(a_d, a_c, atol=2e-2)
    lam = d.marginal_lambda(jnp.asarray(0.5))
    np.testing.assert_allclose(float(d.inverse_lambda(lam)), 0.5, atol=1e-3)


@pytest.mark.parametrize("model_type", ["noise", "x_start", "v", "score"])
def test_model_wrapper_types(ns, model_type, init):
    """All four parameterisations of the same toy model yield the same eps."""
    t = jnp.full((SHAPE[0],), 0.7)
    alpha, sigma = ns.marginal_alpha(t), ns.marginal_std(t)
    a, s = alpha[:, None], sigma[:, None]
    eps_ref = _eps_model(ns)(init, t)
    x0 = (init - s * eps_ref) / a
    raw = {
        "noise": lambda x, tt: eps_ref,
        "x_start": lambda x, tt: x0,
        "v": lambda x, tt: a * eps_ref - s * x0,
        "score": lambda x, tt: -eps_ref / s,
    }[model_type]
    wrapped = model_wrapper(raw, ns, model_type=model_type)
    np.testing.assert_allclose(np.asarray(wrapped(init, t)),
                               np.asarray(eps_ref), atol=1e-10)


def _run_singlestep(alg: str, order: int, step: int, init):
    """Loop the singlestep update over the deriver's uniform grid,
    r in lambda-space fixed (0.5 | 1/3,2/3) — exactly the analyzer setup."""
    ns = NoiseScheduleVP(schedule="linear")
    solver = DPMSolver(model_wrapper(_eps_model(ns), ns), ns,
                       algorithm_type=alg)
    ts = np.linspace(1.0, 0.001, step + 1)
    x = init
    for i in range(step):
        if order == 2:
            x, _ = solver.second_update(x, float(ts[i]), float(ts[i + 1]),
                                        r1=0.5)
        else:
            x, _ = solver.third_update(x, float(ts[i]), float(ts[i + 1]),
                                       r1=1 / 3, r2=2 / 3)
    return np.asarray(x)


def _run_ni(name: str, step: int, init):
    m = registry.derive(name, step)
    sched = NISchedule.from_matrix(m, dtype=jnp.float64)
    return np.asarray(natural_inference(
        toy_x0, sched, init, prediction_type="x0",
        accum_dtype=jnp.float64))


@pytest.mark.parametrize("alg,name,order", [
    ("dpmsolver", "dpmsolver2s", 2),
    ("dpmsolver++", "dpmsolverpp2s", 2),
    ("dpmsolver", "dpmsolver3s", 3),
])
def test_singlestep_equals_ni_matrix(alg, name, order, init):
    step = 6
    direct = _run_singlestep(alg, order, step, init)
    ni = _run_ni(name, step, init)
    np.testing.assert_allclose(direct, ni, atol=1e-8)


def test_pp3s_matches_deps_formula_oracle(init):
    """DPM-Solver++(3S): the reference's ANALYZER flips two signs relative to
    the reference's SOLVER LIBRARY (compare ``src/AnalyzeDPMSolver.py:604-628``
    '- eps_diff*(...)' with ``deps/dpm_solver_pytorch.py:737-747``
    '+ r2/r1*phi_22*(...)').  Our deriver follows the analyzer (to match the
    golden npz corpus); our solver follows the library (which produced the FID
    tables).  So pp3s is checked against an independent numpy replay of the
    library formulas instead of the NI matrix."""
    from naturaldiffusion_tpu.schedules import LinearVPSDE
    sde = LinearVPSDE()
    step = 6
    ts = np.linspace(1.0, 0.001, step + 1)
    r1, r2 = 1 / 3, 2 / 3
    x = np.asarray(init, np.float64)

    def model(xx, tt):   # eps from toy x0
        a, s = sde.marginal_coeff(tt)
        return (xx - a * np.tanh(xx) * 0.5) / s

    for i in range(step):
        s, t = ts[i], ts[i + 1]
        lam_s, lam_t = sde.lam(s), sde.lam(t)
        h = lam_t - lam_s
        s1 = sde.inverse_lam(lam_s + r1 * h)
        s2 = sde.inverse_lam(lam_s + r2 * h)
        sig = {v: sde.sigma(v) for v in (s, s1, s2, t)}
        al = {v: sde.alpha(v) for v in (s1, s2, t)}
        phi_11, phi_12, phi_1 = (np.expm1(-r1 * h), np.expm1(-r2 * h),
                                 np.expm1(-h))
        phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
        phi_2 = phi_1 / h + 1.0
        # ++ operates on x0 predictions
        a_s, s_s = sde.marginal_coeff(s)
        m_s = (x - s_s * model(x, s)) / a_s
        x_s1 = sig[s1] / sig[s] * x - al[s1] * phi_11 * m_s
        a1, s1s = sde.marginal_coeff(s1)
        m_s1 = (x_s1 - s1s * model(x_s1, s1)) / a1
        x_s2 = (sig[s2] / sig[s] * x - al[s2] * phi_12 * m_s
                + r2 / r1 * al[s2] * phi_22 * (m_s1 - m_s))
        a2, s2s = sde.marginal_coeff(s2)
        m_s2 = (x_s2 - s2s * model(x_s2, s2)) / a2
        x = (sig[t] / sig[s] * x - al[t] * phi_1 * m_s
             + (1.0 / r2) * al[t] * phi_2 * (m_s2 - m_s))

    got = _run_singlestep("dpmsolver++", 3, step, init)
    np.testing.assert_allclose(got, x, atol=1e-8)


def test_multistep_converges(ns, init):
    """Multistep order-2/3 approach a tightly-resolved reference solution."""
    model = model_wrapper(_eps_model(ns), ns)
    ref = DPMSolver(model, ns).sample(init, steps=120, order=3,
                                      method="multistep", t_end=1e-3)
    errs = []
    for steps in (8, 16, 32):
        x = DPMSolver(model, ns).sample(init, steps=steps, order=2,
                                        method="multistep", t_end=1e-3)
        errs.append(float(jnp.abs(x - ref).max()))
    assert errs[2] < errs[1] < errs[0], errs
    assert errs[2] < 2e-2, errs


def test_singlestep_fast_plan(ns, init):
    """'DPM-Solver-fast' order mixing runs and converges."""
    model = model_wrapper(_eps_model(ns), ns)
    solver = DPMSolver(model, ns, algorithm_type="dpmsolver++")
    ref = solver.sample(init, steps=120, order=3, method="multistep",
                        t_end=1e-3)
    # the toy eps model is stiff near t_end (sigma ~ 1e-2), so singlestep at
    # single-digit NFE converges slowly; require monotone decrease
    errs = [float(jnp.abs(solver.sample(init, steps=s, order=3,
                                        method="singlestep", t_end=1e-3)
                          - ref).max()) for s in (9, 15, 27)]
    assert errs[2] < errs[1] < errs[0], errs


def test_adaptive_matches_reference_solution(ns, init):
    model = model_wrapper(_eps_model(ns), ns)
    solver = DPMSolver(model, ns, algorithm_type="dpmsolver")
    ref = solver.sample(init.astype(jnp.float32), steps=120, order=3,
                        method="multistep", t_end=1e-3)
    x = solver.sample(init.astype(jnp.float32), method="adaptive", order=2,
                      t_end=1e-3, atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(x - ref).max()) < 1e-2


def test_inverse_then_sample_roundtrip(ns):
    """x0 -> xT -> x0 via first-order (DDIM) inversion is near-exact for a
    smooth model at high step count."""
    model = model_wrapper(_eps_model(ns), ns)
    solver = DPMSolver(model, ns, algorithm_type="dpmsolver++")
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(SHAPE) * 0.1)
    # [0.05, 1.0]: the toy eps model is stiff below t ~ sigma=1e-2
    xT = solver.inverse(x0, steps=100, order=1, method="multistep",
                        t_start=0.05)
    back = solver.sample(xT, steps=100, order=1, method="multistep",
                         t_end=0.05)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=5e-3)


def test_dynamic_thresholding():
    x = jnp.asarray([[0.5, -2.0, 10.0, -0.1]])
    out = np.asarray(dynamic_thresholding(x, ratio=1.0, max_val=1.0))
    # s = 10 -> clip to [-10, 10] then /10
    np.testing.assert_allclose(out, [[0.05, -0.2, 1.0, -0.01]], atol=1e-6)
    # all small -> s = max_val = 1, unchanged
    x2 = jnp.asarray([[0.5, -0.2, 0.9, -0.1]])
    np.testing.assert_allclose(np.asarray(dynamic_thresholding(x2)),
                               np.asarray(x2), atol=1e-6)
