"""Camera-scatter reduce kernels (`pallas_schur.cam_scatter_reduce`).

The camera-direction reductions normally stream camera-sorted copies
(W_cam_t / JR_cam_t) plus an (8, n) pre-gathered operand; the scatter
mode streams the POINT-sorted arrays and accumulates into a persistent
(ncams, d_out) VMEM buffer across the sequential grid.  These tests pin
exact agreement between the two formulations (both are exact 0/1-matmul
reductions — no tolerance beyond f32 reassociation) and end-to-end
solver parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops import pallas_schur
from bundleadjustment_jl_tpu.ops.pallas_schur import (
    cam_scatter_reduce, pad_rows, tile_bounds, to_k_minor)


@pytest.fixture
def prob():
    p, _ = synthetic_bal(ncams=9, npnts=300, obs_per_pnt=4, seed=11,
                         dtype=jnp.float32, noise_px=1.0, perturb=2e-2,
                         pad_obs_to=128 * ((300 * 4 + 127) // 128))
    return p


def _wt_random(prob, seed=0):
    rng = np.random.default_rng(seed)
    n = prob.nobs_pad
    W_f = rng.standard_normal(n * 27).astype(np.float32)
    W_f[prob.nobs * 27:] = 0.0          # padding rows carry zero blocks
    return jnp.asarray(W_f), to_k_minor(jnp.asarray(W_f))


def test_cam_scatter_w_op_matches_cam_sorted(prob):
    """d_out=9 per-point-operand product == wt_cam_reduce."""
    W_f, W_t = _wt_random(prob)
    rng = np.random.default_rng(1)
    op = jnp.asarray(rng.standard_normal((prob.npnts, 3)), jnp.float32)
    op8 = pad_rows(op.T, 8)
    bounds = tile_bounds(prob.pnt_starts, prob.npnts)
    got = cam_scatter_reduce(
        W_t, prob.cam_idx, bounds, prob.ncams, d_out=9,
        prod=pallas_schur._prod_w_op, idx_row=prob.pnt_idx, op_t=op8,
        interpret=True)
    W_cam_t = W_t[:, prob.cam_perm]
    ref = pallas_schur.wt_cam_reduce(
        W_cam_t, op8[:, prob.pnt_idx[prob.cam_perm]],
        prob.cam_idx[prob.cam_perm], prob.cam_starts, prob.ncams,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_cam_scatter_wcw_matches_cam_sorted(prob):
    """d_out=81 W C W' (Schur diagonal correction) == wcw_cam_reduce."""
    W_f, W_t = _wt_random(prob, seed=2)
    rng = np.random.default_rng(3)
    # SPD-ish random symmetric 3x3 per point
    A = rng.standard_normal((prob.npnts, 3, 3)).astype(np.float32)
    C33 = A @ np.swapaxes(A, 1, 2) + 3.0 * np.eye(3, dtype=np.float32)
    C_f = jnp.asarray(C33.reshape(-1))
    h6 = C_f.reshape(-1, 9)[:, jnp.array([0, 1, 2, 4, 5, 8])]
    bounds = tile_bounds(prob.pnt_starts, prob.npnts)
    got = cam_scatter_reduce(
        W_t, prob.cam_idx, bounds, prob.ncams, d_out=81,
        prod=pallas_schur._prod_wcw, idx_row=prob.pnt_idx,
        op_t=pad_rows(h6.T, 8), interpret=True)
    W_cam_t = W_t[:, prob.cam_perm]
    c6 = pallas_schur.hpp_inv_sym6_t(C_f, prob.pnt_idx[prob.cam_perm])
    ref = pallas_schur.wcw_cam_reduce(
        W_cam_t, c6, prob.cam_idx[prob.cam_perm], prob.cam_starts,
        prob.ncams, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_cam_scatter_jtj_matches_cam_sorted(prob):
    """d_out=90 assembly reduce (no operand) == jtj_cam_reduce."""
    from bundleadjustment_jl_tpu.ops import pallas_linearize
    cxw = pallas_linearize.pack_operands(
        prob.cams, prob.points, prob.cam_idx, prob.pnt_idx, prob.pt2d,
        prob.w)
    JR_t, _ = pallas_linearize.linearize_w_kminor(cxw, interpret=True)
    bounds = tile_bounds(prob.pnt_starts, prob.npnts)
    got = cam_scatter_reduce(
        JR_t, prob.cam_idx, bounds, prob.ncams, d_out=90,
        prod=pallas_schur._prod_cam90, interpret=True)
    ref = pallas_schur.jtj_cam_reduce(
        JR_t[:, prob.cam_perm], prob.cam_idx[prob.cam_perm],
        prob.cam_starts, prob.ncams, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_fused_matvec_matches_two_pass(prob):
    """Single-stream fused matvec (in-kernel t + cached W apply) ==
    the two-pass point/camera formulation, including the VMEM-cache
    overflow path (MV_CACHE_CHUNKS=1 forces re-streaming)."""
    from bundleadjustment_jl_tpu.ops.normal import inv3x3_damped_flat
    W_f, W_t = _wt_random(prob, seed=7)
    rng = np.random.default_rng(8)
    v = jnp.asarray(rng.standard_normal((prob.ncams, 9)), jnp.float32)
    Hpp_f = jnp.asarray(
        rng.standard_normal(prob.npnts * 9), jnp.float32)
    hpp_inv_f = inv3x3_damped_flat(
        jnp.abs(Hpp_f) + 1.0, jnp.float32(1.0))
    bounds = tile_bounds(prob.pnt_starts, prob.npnts)

    t8 = pallas_schur.wtv_point_reduce(
        W_t, v, prob.pnt_idx, prob.cam_idx, prob.pnt_starts,
        prob.npnts, hpp_inv_f=hpp_inv_f, out_k8=True, interpret=True)
    ref = pallas_schur.wt_cam_reduce(
        W_t[:, prob.cam_perm], t8[:, prob.pnt_idx[prob.cam_perm]],
        prob.cam_idx[prob.cam_perm], prob.cam_starts, prob.ncams,
        interpret=True)

    got = pallas_schur.matvec_cam_scatter(
        W_t, v, prob.cam_idx, prob.pnt_idx, hpp_inv_f, bounds,
        prob.ncams, prob.npnts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)

    old = pallas_schur.MV_CACHE_CHUNKS
    try:
        pallas_schur.MV_CACHE_CHUNKS = 1   # force the overflow loop
        got2 = pallas_schur.matvec_cam_scatter(
            W_t, v, prob.cam_idx, prob.pnt_idx, hpp_inv_f, bounds,
            prob.ncams, prob.npnts, interpret=True)
    finally:
        pallas_schur.MV_CACHE_CHUNKS = old
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_fused_assembly_matches_split(prob):
    """The single-pass fused assembly (`pallas_assemble.assemble_scatter`)
    reproduces the split linearize+reduce pipeline exactly: same blocks,
    same W, same objective."""
    from bundleadjustment_jl_tpu.ops.normal import assemble_blocks

    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
           pallas_schur.CAM_SCATTER)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        pallas_schur.CAM_SCATTER = False
        ref = assemble_blocks(prob, with_jr=False, kminor=True)
        pallas_schur.CAM_SCATTER = True
        got = assemble_blocks(prob, with_jr=False, kminor=True)
    finally:
        (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
         pallas_schur.CAM_SCATTER) = old
    assert got.W_cam_t is None
    np.testing.assert_allclose(float(got.obj), float(ref.obj),
                               rtol=1e-6)
    for name in ("g_c_f", "g_p_f", "Hcc_f", "Hpp_f", "W_t"):
        # different summation orders (chunk scatter vs camera-sorted
        # tiles) -> pure f32 reassociation noise
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=1e-4, atol=1e-3, err_msg=name)


def test_reduce_and_diag_and_backsub_quad(prob):
    """The one-stream fusions (diag+RHS; back-substitution+quad cross)
    match their two-kernel scatter-mode formulations."""
    from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
    from bundleadjustment_jl_tpu.ops.schur import (
        back_substitute, back_substitute_quad, quad_form, reduce_and_diag,
        reduce_system, schur_diag_blocks)

    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
           pallas_schur.CAM_SCATTER)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        pallas_schur.CAM_SCATTER = True
        blocks = assemble_blocks(prob, with_jr=False, kminor=True)
        lam = jnp.float32(5.0)
        sys1, Sd1 = reduce_and_diag(prob, blocks, lam)
        sys2 = reduce_system(prob, blocks, lam)
        Sd2 = schur_diag_blocks(sys2)
        np.testing.assert_allclose(np.asarray(sys1.b_f),
                                   np.asarray(sys2.b_f),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Sd1), np.asarray(Sd2),
                                   rtol=1e-4, atol=1e-3)

        rng = np.random.default_rng(4)
        dc = jnp.asarray(rng.standard_normal((prob.ncams, 9)) * 1e-2,
                         jnp.float32)
        dp1, Jd2_1 = back_substitute_quad(prob, blocks, sys1, dc)
        dp2 = back_substitute(sys2, dc)
        Jd2_2 = quad_form(prob, blocks, dc, dp2)
        np.testing.assert_allclose(np.asarray(dp1), np.asarray(dp2),
                                   rtol=1e-4, atol=1e-5)
        assert float(Jd2_1) == pytest.approx(float(Jd2_2), rel=1e-4)
    finally:
        (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
         pallas_schur.CAM_SCATTER) = old


def test_solver_parity_mid_gate_regime():
    """ncams between the gates (scatter reduces ON, in-VMEM camera
    tables OFF): the d_out=90/81 scatter kernels combine with the
    pre-gathered two-pass matvec.  Exercised by lowering the table gate
    below ncams."""
    from bundleadjustment_jl_tpu.solver.lm_jit import levenberg_marquardt_jit
    prob, _ = synthetic_bal(ncams=9, npnts=300, obs_per_pnt=4, seed=6,
                            dtype=jnp.float32, noise_px=1.0, perturb=2e-2,
                            pad_obs_to=1024)
    opts = dict(max_iters=12, pcg_max_iters=60, lam0_mode="diag")
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
           pallas_schur.CAM_SCATTER, pallas_schur.GATHER_TABLE_MAX_CAMS)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        pallas_schur.CAM_SCATTER = False
        ref = levenberg_marquardt_jit(prob, **opts)
        pallas_schur.CAM_SCATTER = True
        pallas_schur.GATHER_TABLE_MAX_CAMS = 4   # < ncams: no v tables
        got = levenberg_marquardt_jit(prob, **opts)
    finally:
        (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
         pallas_schur.CAM_SCATTER,
         pallas_schur.GATHER_TABLE_MAX_CAMS) = old
    assert int(got.iterations) == int(ref.iterations)
    robj = float(ref.objective)
    assert abs(float(got.objective) - robj) <= 1e-5 * max(1.0, robj)


def test_objective_scatter_matches_residuals(prob):
    """Fused streaming trial objectives == direct residual objectives
    for every linesearch scale."""
    from bundleadjustment_jl_tpu.ops import pallas_assemble
    from bundleadjustment_jl_tpu.ops.pallas_schur import _chunk_rows
    from bundleadjustment_jl_tpu.ops.residuals import residuals

    rng = np.random.default_rng(9)
    dc = jnp.asarray(rng.standard_normal((prob.ncams, 9)) * 1e-2,
                     jnp.float32)
    dp = jnp.asarray(rng.standard_normal((prob.npnts, 3)) * 1e-2,
                     jnp.float32)
    scales = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
    C = _chunk_rows(prob.nobs_pad)
    width = -(-(prob.npnts + C + 256) // 128) * 128
    pw = pallas_assemble.pack_pw(prob)
    cams_all = prob.cams[None] + scales[:, None, None] * dc[None]
    pts_all = pallas_assemble.stack_trial_points(
        prob.points, dp, scales, width)
    pofs = pallas_assemble.trial_point_offsets(
        prob.pnt_idx, prob.nobs_pad, width, C)
    got = pallas_assemble.objective_scatter(pw, pts_all, cams_all, pofs,
                                            interpret=True)
    for s in range(3):
        r = residuals(prob, prob.cams + scales[s] * dc,
                      prob.points + scales[s] * dp)
        ref = 0.5 * float(jnp.sum(r * r))
        assert float(got[s]) == pytest.approx(ref, rel=1e-5), s


def test_spmd_parity_cam_scatter():
    """Chunked spmd driver with CAM_SCATTER on (W_cam_t never built; the
    None leaf crosses the shard_map boundary) matches the flag-off solve."""
    from jax.sharding import Mesh

    from bundleadjustment_jl_tpu.parallel.spmd import shard_problem_kminor
    from bundleadjustment_jl_tpu.solver.lm_spmd import (
        levenberg_marquardt_spmd_chunked)
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(devs[:4]), ("obs",))
    prob, _ = synthetic_bal(ncams=11, npnts=400, obs_per_pnt=4, seed=3,
                            dtype=jnp.float32, perturb=2e-2, noise_px=1.0)
    opts = dict(max_iters=12, pcg_max_iters=60, lam0_mode="diag",
                chunk_iters=4)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
           pallas_schur.CAM_SCATTER)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        sp = shard_problem_kminor(prob, 4, mesh=mesh)
        pallas_schur.CAM_SCATTER = False
        ref = levenberg_marquardt_spmd_chunked(sp, mesh, **opts)
        pallas_schur.CAM_SCATTER = True
        got = levenberg_marquardt_spmd_chunked(sp, mesh, **opts)
    finally:
        (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
         pallas_schur.CAM_SCATTER) = old
    assert int(got.iterations) == int(ref.iterations)
    robj = float(ref.objective)
    assert abs(float(got.objective) - robj) <= 1e-5 * max(1.0, robj)


@pytest.mark.parametrize("linesearch", [False, True])
def test_solver_parity_cam_scatter(linesearch):
    """Full jit solve with CAM_SCATTER on == off (identical iteration
    count; objective to f32 reassociation).  The linesearch variant
    exercises the multi-scale fused trial objectives."""
    from bundleadjustment_jl_tpu.solver.lm_jit import levenberg_marquardt_jit
    prob, _ = synthetic_bal(ncams=8, npnts=256, obs_per_pnt=4, seed=5,
                            dtype=jnp.float32, noise_px=1.0, perturb=2e-2,
                            pad_obs_to=1024)
    opts = dict(max_iters=15, pcg_max_iters=60, lam0_mode="diag",
                linesearch=linesearch)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
           pallas_schur.CAM_SCATTER)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        pallas_schur.CAM_SCATTER = False
        ref = levenberg_marquardt_jit(prob, **opts)
        pallas_schur.CAM_SCATTER = True
        got = levenberg_marquardt_jit(prob, **opts)
    finally:
        (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
         pallas_schur.CAM_SCATTER) = old
    assert int(got.iterations) == int(ref.iterations)
    robj = float(ref.objective)
    assert abs(float(got.objective) - robj) <= 1e-5 * max(1.0, robj)
