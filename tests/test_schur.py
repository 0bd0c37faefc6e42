"""Schur-complement reduction + PCG vs a dense oracle solve.

The reference validates its linear solvers against ``A \\ b``
(`test/runtests.jl:111-180`); here the oracle is a dense solve of the full
damped normal equations assembled from `jax.jacrev` of the flat residual.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks, gradient_norm, inv3x3
from bundleadjustment_jl_tpu.ops.pcg import block_cho_solve, block_cholesky, pcg
from bundleadjustment_jl_tpu.ops.residuals import residuals
from bundleadjustment_jl_tpu.ops.schur import (
    assemble_dense_schur, back_substitute, predicted_reduction,
    reduce_system, schur_diag_blocks, schur_matvec, solve_dense)

LAM = 1e-2


@pytest.fixture(scope="module")
def setup():
    problem, _ = synthetic_bal(ncams=6, npnts=30, obs_per_pnt=3, seed=11,
                               perturb=5e-2)
    blocks = assemble_blocks(problem)
    sys = reduce_system(problem, blocks, LAM)
    return problem, blocks, sys


@pytest.fixture(scope="module")
def dense_oracle(setup):
    """Dense (J'J + lam I) d = -J'r in the flat points-first layout."""
    problem, _, _ = setup

    def flat_res(x):
        cams, points = problem.unflatten_state(x)
        return residuals(problem, cams, points).reshape(-1)

    x0 = problem.flatten_state()
    J = jax.jacrev(flat_res)(x0)
    r = flat_res(x0)
    H = J.T @ J + LAM * jnp.eye(problem.nvar, dtype=x0.dtype)
    g = J.T @ r
    d = jnp.linalg.solve(H, -g)
    return J, r, g, d


def test_inv3x3():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(17, 3, 3))
    M = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(3)
    Minv = inv3x3(jnp.asarray(M))
    np.testing.assert_allclose(M @ np.asarray(Minv),
                               np.broadcast_to(np.eye(3), M.shape),
                               rtol=0, atol=1e-10)


def test_gradients_match_dense(setup, dense_oracle):
    problem, blocks, _ = setup
    _, _, g, _ = dense_oracle
    n3 = 3 * problem.npnts
    np.testing.assert_allclose(blocks.g_p.reshape(-1), g[:n3],
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(blocks.g_c.reshape(-1), g[n3:],
                               rtol=1e-9, atol=1e-9)
    gn = float(gradient_norm(blocks))
    np.testing.assert_allclose(gn, float(jnp.linalg.norm(g)), rtol=1e-10)


def test_dense_schur_matches_matvec(setup):
    _, _, sys = setup
    S = assemble_dense_schur(sys)
    ncams = sys.Hcc_l.shape[0]
    rng = np.random.default_rng(1)
    for _ in range(3):
        v = jnp.asarray(rng.normal(size=(ncams, 9)))
        np.testing.assert_allclose(
            schur_matvec(sys, v).reshape(-1), S @ v.reshape(-1),
            rtol=1e-9, atol=1e-9)


def test_schur_solve_matches_dense_oracle(setup, dense_oracle):
    """Point elimination + dense camera solve == full dense solve."""
    problem, _, sys = setup
    _, _, _, d = dense_oracle
    dc = solve_dense(sys)
    dp = back_substitute(sys, dc)
    n3 = 3 * problem.npnts
    np.testing.assert_allclose(dp.reshape(-1), d[:n3], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(dc.reshape(-1), d[n3:], rtol=1e-7, atol=1e-9)


def test_pcg_matches_dense_solve(setup):
    _, _, sys = setup
    dc_direct = solve_dense(sys)
    L = block_cholesky(schur_diag_blocks(sys))

    dc_pcg = pcg(lambda v: schur_matvec(sys, v), sys.b,
                 lambda v: block_cho_solve(L, v),
                 rtol=1e-12, max_iters=200)
    assert float(dc_pcg.rel_res) < 1e-10
    np.testing.assert_allclose(np.asarray(dc_pcg.x), np.asarray(dc_direct),
                               rtol=1e-6, atol=1e-8)


def test_pcg_breakdown_stops_early():
    """An indefinite operator (the low-precision-W perturbed Schur
    complement at small lambda) must STOP CG at breakdown, not spin with
    alpha=0 until max_iters (the measured bf16-facto pathology)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    A = jnp.asarray(np.diag([1.0, 1.0, -1.0, 1.0] * 9))   # indefinite
    b = jnp.asarray(rng.standard_normal((4, 9)))

    res = pcg(lambda v: (A @ v.reshape(-1)).reshape(4, 9), b,
              lambda v: v, rtol=1e-12, max_iters=200)
    # CG must give up within a few iterations once p'Ap <= 0 appears,
    # returning a finite iterate
    assert int(res.iters) < 10
    assert bool(jnp.all(jnp.isfinite(res.x)))


def test_preconditioner_blocks_match_dense(setup):
    _, _, sys = setup
    S = np.asarray(assemble_dense_schur(sys))
    diag = np.asarray(schur_diag_blocks(sys))
    for i in range(sys.Hcc_l.shape[0]):
        np.testing.assert_allclose(diag[i], S[9 * i:9 * i + 9, 9 * i:9 * i + 9],
                                   rtol=1e-9, atol=1e-9)


def test_predicted_reduction_matches_dense(setup, dense_oracle):
    problem, blocks, sys = setup
    J, r, _, _ = dense_oracle
    dc = solve_dense(sys)
    dp = back_substitute(sys, dc)
    pred = float(predicted_reduction(problem, blocks, dc, dp))
    d = jnp.concatenate([dp.reshape(-1), dc.reshape(-1)])
    pred_dense = 0.5 * float(r @ r) - 0.5 * float(
        jnp.sum((J @ d + r) ** 2))
    np.testing.assert_allclose(pred, pred_dense, rtol=1e-7)


def test_power_series_matches_dense(setup):
    """PBA-style Neumann expansion converges to the dense Schur solution.

    The series' rate is the spectral radius of M^-1 N, which approaches 1
    as lambda -> 0 (gauge directions), so a well-damped system is used and
    convergence is checked at the loose tolerances the method targets
    (inexact LM steps) plus full agreement at a strong damping.
    """
    from bundleadjustment_jl_tpu.ops.pcg import (
        block_cho_solve, block_cholesky, power_series)
    problem, blocks, _ = setup
    sys = reduce_system(problem, blocks, 10.0)  # well-damped
    L_M = block_cholesky(sys.Hcc_l)
    res = power_series(
        lambda v: schur_matvec(sys, v), sys.b,
        lambda v: jnp.einsum("cab,cb->ca", sys.Hcc_l, v),
        lambda v: block_cho_solve(L_M, v),
        rtol=2e-4, max_terms=3000)
    dc = solve_dense(sys)
    assert float(res.rel_res) < 2e-4
    err = (np.linalg.norm(np.asarray(res.x) - np.asarray(dc))
           / np.linalg.norm(np.asarray(dc)))
    assert err < 5e-2, err
