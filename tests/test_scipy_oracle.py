"""Independent-solver oracle: scipy.optimize.least_squares (TRF).

The reference keeps `src/SolverScipy.py` as its external correctness
baseline (SURVEY.md §2.1, `scipy_results`); here scipy solves the same
small synthetic problems and both solvers must land on (statistically) the
same optimum. This also fills the role of the reference's JuMP/Ipopt and
CUTEst cross-checks (`src/ModelJuMP.jl`, `src/CUTEst_compare.jl`):
independent optimizer, independent model evaluation path.
"""

import numpy as np
import pytest
from scipy.optimize import least_squares
from scipy.sparse import lil_matrix

from bundleadjustment_jl_tpu.io.synthetic import _project_np, synthetic_bal
from bundleadjustment_jl_tpu.ops.residuals import residuals
from bundleadjustment_jl_tpu.solver.lm import LMOptions, levenberg_marquardt


def _scipy_solve(problem):
    """Vectorized NumPy TRF solve in the scipy layout [cams; points]
    (the reference's `SolverScipy.py:104-138`, same tolerances)."""
    ncams, npnts, n = problem.ncams, problem.npnts, problem.nobs
    cam_idx = np.asarray(problem.cam_idx[:n])
    pnt_idx = np.asarray(problem.pnt_idx[:n])
    pt2d = np.asarray(problem.pt2d[:n])

    def fun(x):
        cams = x[:9 * ncams].reshape(ncams, 9)
        pnts = x[9 * ncams:].reshape(npnts, 3)
        return (_project_np(cams[cam_idx], pnts[pnt_idx]) - pt2d).ravel()

    # sparsity pattern (`SolverScipy.py:75-89`)
    A = lil_matrix((2 * n, 9 * ncams + 3 * npnts), dtype=int)
    i = np.arange(n)
    for s in range(9):
        A[2 * i, cam_idx * 9 + s] = 1
        A[2 * i + 1, cam_idx * 9 + s] = 1
    for s in range(3):
        A[2 * i, 9 * ncams + pnt_idx * 3 + s] = 1
        A[2 * i + 1, 9 * ncams + pnt_idx * 3 + s] = 1

    x0 = np.concatenate([np.asarray(problem.cams).ravel(),
                         np.asarray(problem.points).ravel()])
    res = least_squares(fun, x0, jac_sparsity=A, verbose=0, x_scale="jac",
                        ftol=6e-6, gtol=6e-6, xtol=1.5e-8, method="trf")
    return 0.5 * float(res.cost) * 2.0  # scipy cost is 0.5*||r||^2 already


@pytest.fixture(scope="module")
def problem():
    p, _ = synthetic_bal(ncams=6, npnts=50, obs_per_pnt=3,
                         noise_px=0.5, perturb=2e-2, seed=50)
    return p


def test_numpy_model_matches_jax_model(problem):
    """The host oracle model and the JAX model agree at the start point
    (same role as the reference exporting Python residuals to compare,
    `CUTEst_compare.jl:113-125`)."""
    n = problem.nobs
    cams = np.asarray(problem.cams)
    pnts = np.asarray(problem.points)
    proj = _project_np(cams[np.asarray(problem.cam_idx[:n])],
                       pnts[np.asarray(problem.pnt_idx[:n])])
    r_np = proj - np.asarray(problem.pt2d[:n])
    r_jax = np.asarray(residuals(problem))[:n]
    np.testing.assert_allclose(r_np, r_jax, rtol=1e-10, atol=1e-10)


def test_lm_matches_scipy_trf_optimum(problem):
    scipy_obj = _scipy_solve(problem)
    res = levenberg_marquardt(
        problem, LMOptions(solver="dense", max_iters=200, linesearch=True,
                           lam0_mode="diag", lam_strategy="nielsen",
                           oatol=0.0, ortol=1e-7))
    assert res.solved(), res.status
    # same basin, same optimum to ~0.1% (the reference's LM-vs-scipy spread
    # on real problems is of this order, BASELINE.md)
    np.testing.assert_allclose(res.objective, scipy_obj, rtol=2e-3)
