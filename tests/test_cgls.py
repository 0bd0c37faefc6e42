"""Damped CGLS (QR-path analogue): step correctness vs the dense oracle,
and full LM convergence with the cgls inner solver."""

import jax.numpy as jnp
import numpy as np

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.cgls import cgls_solve, j_matvec, jt_matvec
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
from bundleadjustment_jl_tpu.ops.schur import (
    back_substitute, reduce_system, solve_dense)
from bundleadjustment_jl_tpu.solver.lm import LMOptions, levenberg_marquardt
from bundleadjustment_jl_tpu.solver.lm_jit import (
    STATUS_NAMES, levenberg_marquardt_jit)

LAM = 1e-2


def test_cgls_step_matches_schur_dense():
    problem, _ = synthetic_bal(ncams=6, npnts=40, obs_per_pnt=3,
                               perturb=3e-2, seed=100)
    blocks = assemble_blocks(problem)
    res = cgls_solve(problem, blocks, jnp.asarray(LAM), rtol=1e-13,
                     max_iters=2000)
    assert float(res.rel_grad) < 1e-10
    sys = reduce_system(problem, blocks, LAM)
    dc = solve_dense(sys)
    dp = back_substitute(sys, dc)
    np.testing.assert_allclose(np.asarray(res.dc), np.asarray(dc),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.dp), np.asarray(dp),
                               rtol=1e-6, atol=1e-9)


def test_j_and_jt_are_adjoint():
    problem, _ = synthetic_bal(ncams=5, npnts=30, obs_per_pnt=3, seed=101)
    blocks = assemble_blocks(problem)
    rng = np.random.default_rng(0)
    dc = jnp.asarray(rng.normal(size=(problem.ncams, 9)))
    dp = jnp.asarray(rng.normal(size=(problem.npnts, 3)))
    s = jnp.asarray(rng.normal(size=(problem.nobs_pad, 2)))
    lhs = float(jnp.vdot(j_matvec(problem, blocks, dc, dp), s))
    vc, vp = jt_matvec(problem, blocks, s)
    rhs = float(jnp.vdot(vc, dc) + jnp.vdot(vp, dp))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_lm_with_cgls_converges_both_drivers():
    problem, _ = synthetic_bal(ncams=8, npnts=60, obs_per_pnt=3,
                               noise_px=0.3, perturb=2e-3, seed=102)
    host = levenberg_marquardt(problem, LMOptions(
        solver="cgls", max_iters=60, pcg_max_iters=300))
    assert host.solved(), host.status
    jit = levenberg_marquardt_jit(problem, max_iters=60,
                                  pcg_max_iters=300, use_cgls=True)
    assert STATUS_NAMES[int(jit.status)] in (
        "first_order", "small_step", "small_residual", "small_obj_change")
    ref = levenberg_marquardt(problem, LMOptions(solver="dense",
                                                 max_iters=60))
    np.testing.assert_allclose(host.objective, ref.objective, rtol=1e-2)
    np.testing.assert_allclose(float(jit.objective), ref.objective,
                               rtol=1e-2)
