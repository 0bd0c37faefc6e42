"""LM solver integration tests on tiny synthetic problems with known optima —
the solver-loop coverage the reference lacks (SURVEY.md §5 "lesson")."""

import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.residuals import objective
from bundleadjustment_jl_tpu.solver.lm import LMOptions, levenberg_marquardt


def _solve(problem, **kw):
    opts = LMOptions(**kw)
    return levenberg_marquardt(problem, opts)


def test_converges_to_zero_residual_optimum():
    """noise=0: ground truth is a global optimum with objective 0."""
    problem, truth = synthetic_bal(ncams=8, npnts=60, obs_per_pnt=3,
                                   noise_px=0.0, perturb=1e-3, seed=0)
    assert truth["objective"] == 0.0
    obj0 = float(objective(problem))
    # tight tolerances: drive the gradient (near) all the way down
    res = _solve(problem, solver="dense", max_iters=100,
                 atol=1e-12, rtol=0.0, oatol=0.0, ortol=0.0)
    assert res.solved(), res.status
    assert res.objective < 1e-8 * obj0


def test_converges_with_noise_dense_and_pcg():
    problem, _ = synthetic_bal(ncams=10, npnts=80, obs_per_pnt=4,
                               noise_px=0.5, perturb=1e-3, seed=1)
    nobs = problem.nobs
    res_d = _solve(problem, solver="dense", max_iters=60)
    res_p = _solve(problem, solver="pcg", max_iters=60, pcg_max_iters=200)
    for res in (res_d, res_p):
        assert res.solved(), res.status
        # chi^2 expectation: obj ~ 0.5 * nequ * noise^2 = nobs * 0.25
        assert res.objective < 0.5 * nobs
    np.testing.assert_allclose(res_p.objective, res_d.objective,
                               rtol=1e-2)


def test_monotone_objective_on_accepted_steps():
    problem, _ = synthetic_bal(ncams=6, npnts=50, obs_per_pnt=3,
                               noise_px=0.3, perturb=5e-3, seed=2)
    res = _solve(problem, solver="dense", max_iters=40)
    objs = [h["obj"] for h in res.history if h["accepted"]]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(objs, objs[1:]))


def test_linesearch_variant_converges():
    problem, _ = synthetic_bal(ncams=6, npnts=50, obs_per_pnt=3,
                               noise_px=0.3, perturb=5e-3, seed=4)
    res = _solve(problem, solver="dense", max_iters=60, linesearch=True)
    assert res.solved(), res.status


def test_result_fields_and_history():
    problem, _ = synthetic_bal(ncams=5, npnts=40, obs_per_pnt=3, seed=5)
    res = _solve(problem, solver="dense", max_iters=30)
    assert res.iterations <= 30
    assert res.neval_residual >= res.iterations
    assert res.elapsed_time > 0
    assert np.isfinite(res.dual_feas)
    assert len(res.history) > 0
    for key in ("iter", "obj", "gnorm", "lam", "dnorm", "rho", "accepted"):
        assert key in res.history[0]


def test_max_iters_status():
    problem, _ = synthetic_bal(ncams=6, npnts=50, obs_per_pnt=3,
                               perturb=5e-2, seed=6)
    res = _solve(problem, solver="dense", max_iters=1,
                 # disable every other stop so tired triggers
                 atol=0.0, rtol=0.0, restol=0.0, satol=0.0, srtol=0.0,
                 oatol=0.0, ortol=0.0)
    assert res.status == "max_iter"
    assert res.iterations == 1


def test_warm_start_resumes():
    """The reference's de-facto resume: pass x of a previous solve
    (`benchmark_diffprec.jl:46-53`)."""
    problem, _ = synthetic_bal(ncams=6, npnts=50, obs_per_pnt=3,
                               noise_px=0.2, perturb=1e-2, seed=7)
    res1 = _solve(problem, solver="dense", max_iters=3,
                  atol=0.0, rtol=0.0, oatol=0.0, ortol=0.0)
    res2 = levenberg_marquardt(problem, LMOptions(solver="dense",
                                                  max_iters=60),
                               cams=res1.cams, points=res1.points)
    assert res2.solved()
    assert res2.objective <= res1.objective + 1e-9


def test_nielsen_lambda_strategy():
    """Nielsen gain-ratio damping converges where the reference schedule
    oscillates (and always stays a valid option in both drivers)."""
    from bundleadjustment_jl_tpu.solver.lm_jit import (
        STATUS_NAMES, levenberg_marquardt_jit)
    problem, _ = synthetic_bal(ncams=5, npnts=40, obs_per_pnt=3, seed=3)
    res = _solve(problem, solver="dense", max_iters=100,
                 lam_strategy="nielsen")
    assert res.solved(), res.status
    j = levenberg_marquardt_jit(problem, max_iters=100, use_dense=True,
                                lam_strategy="nielsen")
    assert STATUS_NAMES[int(j.status)] == res.status
    np.testing.assert_allclose(float(j.objective), res.objective, rtol=1e-8)


def test_power_series_solver_converges():
    """PBA-style power-series inner solver drives LM to the optimum in both
    drivers (inexact steps; the series targets loose per-step tolerances)."""
    from bundleadjustment_jl_tpu.solver.lm_jit import (
        STATUS_NAMES, levenberg_marquardt_jit)
    problem, _ = synthetic_bal(ncams=8, npnts=60, obs_per_pnt=3,
                               noise_px=0.3, perturb=2e-3, seed=210)
    ref = _solve(problem, solver="dense", max_iters=60)
    host = _solve(problem, solver="power", max_iters=80, pcg_max_iters=200,
                  pcg_rtol=1e-3, lam0_mode="diag")
    assert host.solved(), host.status
    np.testing.assert_allclose(host.objective, ref.objective, rtol=2e-2)
    jit = levenberg_marquardt_jit(problem, max_iters=80, pcg_max_iters=200,
                                  pcg_rtol=1e-3, lam0_mode="diag",
                                  use_power=True)
    assert STATUS_NAMES[int(jit.status)] != "exception"
    np.testing.assert_allclose(float(jit.objective), ref.objective,
                               rtol=2e-2)
