"""Regression: every deriver reproduces the reference's golden npz corpus.

The corpus (``/root/reference/results/``) was produced by the reference's
SymPy/analytic analyzers; our affine-propagation derivers must match it.
float64 families are compared at 1e-8; DEIS at 2e-4 because the reference ran
its 10k-point quadrature in fp32 JAX while we integrate in float64.
"""

import glob
import os

import numpy as np
import pytest

from naturaldiffusion_tpu.coeffs import CoeffMatrix, DERIVERS

GOLDEN_ROOT = "/root/reference/results"

TOLERANCES = {"deis_tab": 2e-4}
DEFAULT_TOL = 1e-8


def _golden_cases():
    cases = []
    for name, spec in DERIVERS.items():
        pattern = os.path.join(GOLDEN_ROOT, spec.result_dir, f"{spec.prefix}_*.npz")
        for path in sorted(glob.glob(pattern)):
            stem = os.path.basename(path)[:-4]
            suffix = stem[len(spec.prefix) + 1:]
            if not suffix.isdigit():
                continue
            total_rows = int(suffix)
            if total_rows % spec.rows_per_step and spec.rows_per_step > 1:
                # e.g. dpmsolver3s_099 -> 33 outer steps, 201 -> 67
                pass
            step_arg = round(total_rows / spec.rows_per_step)
            cases.append(pytest.param(name, step_arg, path,
                                      id=f"{name}-{total_rows}"))
    return cases


@pytest.mark.parametrize("name,step_arg,path", _golden_cases())
def test_matches_reference(name, step_arg, path):
    spec = DERIVERS[name]
    got = spec.fn(step_arg)
    want = CoeffMatrix.load(path)
    tol = TOLERANCES.get(name, DEFAULT_TOL)

    assert got.x0.shape == want.x0.shape
    assert got.eps.shape == want.eps.shape
    assert got.node.shape == want.node.shape
    np.testing.assert_allclose(got.x0, want.x0, atol=tol, rtol=0)
    np.testing.assert_allclose(got.eps, want.eps, atol=tol, rtol=0)
    np.testing.assert_allclose(got.node, want.node, atol=tol, rtol=0)


@pytest.mark.parametrize("name", [n for n in DERIVERS if "analytic" not in n])
def test_marginal_invariants(name):
    """Property check on a step count NOT in the golden corpus: row-sums of x0
    track alpha_t and eps row-norms track sigma_t (the 'natural' invariant,
    reference check sites e.g. src/AnalyzeDDPMDDIM.py:226-234)."""
    cm = DERIVERS[name].fn(30)
    sig_err, noi_err = cm.marginal_errors()
    # only flow matching is *exact* (the reference's key result,
    # src/AnalyzeFlowMatching.py:131-137); the rest are discretizations whose
    # error shrinks with step count — 30 steps keeps them within a few percent
    tol = {"flow_euler": 1e-12}.get(name, 0.1)
    assert sig_err.max() < tol
    assert noi_err.max() < tol


def test_dual_derivation_cross_check():
    """Analytic closed-form and affine replay agree (the reference's own
    consistency strategy, src/AnalyzeDDPMDDIM.py:446-453)."""
    from naturaldiffusion_tpu.coeffs import ddpm_ddim, flow

    for pair in [(ddpm_ddim.derive_ddpm, ddpm_ddim.derive_ddpm_analytic),
                 (ddpm_ddim.derive_ddim, ddpm_ddim.derive_ddim_analytic),
                 (flow.derive_flow_euler, flow.derive_flow_euler_analytic)]:
        a, b = (f(12) for f in pair)
        np.testing.assert_allclose(a.x0, b.x0, atol=1e-10)
        np.testing.assert_allclose(a.eps, b.eps, atol=1e-10)
        # node rows differ only in the hard-coded [_, 0, 1] start row of the
        # analytic path
        np.testing.assert_allclose(a.node[1:], b.node[1:], atol=1e-10)


def test_roundtrip_io(tmp_path):
    cm = DERIVERS["ddim"].fn(6)
    p = str(tmp_path / "m.npz")
    cm.save(p)
    back = CoeffMatrix.load(p)
    np.testing.assert_array_equal(cm.x0, back.x0)
    np.testing.assert_array_equal(cm.eps, back.eps)
    np.testing.assert_array_equal(cm.node, back.node)
    cm.save_csv(str(tmp_path / "m.csv"))
    assert (tmp_path / "m.csv").read_text().count("\n") == 7
