"""Pallas fused Schur kernels vs the XLA oracle (interpret mode on CPU).

The kernels (`ops/pallas_schur.py`) collapse each direction of the
matrix-free ``S @ v`` into one streaming pass; interpret mode runs the
exact kernel code without a Mosaic compile, so these tests validate the
indexing/masking/one-hot logic the TPU executes.  Reference role: the
per-iteration sparse factorization sweep `/root/reference/src/ldl_aux.jl:122-201`.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops import pallas_schur, schur
from bundleadjustment_jl_tpu.ops.blockmul import w_dot_b, wT_dot_a
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
from bundleadjustment_jl_tpu.ops.segsum import segment_sum_scatter
from bundleadjustment_jl_tpu.solver.lm_jit import levenberg_marquardt_jit


@pytest.fixture
def sys_v():
    prob, _ = synthetic_bal(ncams=11, npnts=200, obs_per_pnt=4, seed=0,
                            dtype=jnp.float32)
    blocks = assemble_blocks(prob)
    s = schur.reduce_system(prob, blocks, 1e-2)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((prob.ncams, 9)), dtype=jnp.float32)
    return prob, s, v


def _tol(ref):
    return 1e-5 * (1.0 + float(jnp.max(jnp.abs(ref))))


def test_point_reduce_matches_scatter(sys_v):
    prob, s, v = sys_v
    oracle = segment_sum_scatter(
        wT_dot_a(s.W_f, v[s.cam_idx]), s.pnt_idx, prob.npnts)
    got = pallas_schur.wtv_point_reduce(
        pallas_schur.to_k_minor(s.W_f), v, s.pnt_idx, s.cam_idx,
        s.pnt_starts, prob.npnts, interpret=True)
    assert float(jnp.max(jnp.abs(got - oracle))) <= _tol(oracle)
    # k-minor (8, npnts) raw output for the in-matvec handoff
    got8 = pallas_schur.wtv_point_reduce(
        pallas_schur.to_k_minor(s.W_f), v, s.pnt_idx, s.cam_idx,
        s.pnt_starts, prob.npnts, out_k8=True, interpret=True)
    assert got8.shape == (8, prob.npnts)
    assert float(jnp.max(jnp.abs(got8[:3] - oracle.T))) <= _tol(oracle)
    assert float(jnp.max(jnp.abs(got8[3:]))) == 0.0


def test_point_reduce_fold_and_backsub(sys_v):
    prob, s, v = sys_v
    t = segment_sum_scatter(
        wT_dot_a(s.W_f, v[s.cam_idx]), s.pnt_idx, prob.npnts)
    folded = jnp.einsum("pab,pb->pa", s.Hpp_inv, t)
    W_t = pallas_schur.to_k_minor(s.W_f)
    got = pallas_schur.wtv_point_reduce(
        W_t, v, s.pnt_idx, s.cam_idx, s.pnt_starts, prob.npnts,
        hpp_inv_f=s.Hpp_inv_f, interpret=True)
    assert float(jnp.max(jnp.abs(got - folded))) <= _tol(folded)

    dp = -jnp.einsum("pab,pb->pa", s.Hpp_inv, s.g_p + t)
    got_dp = pallas_schur.wtv_point_reduce(
        W_t, v, s.pnt_idx, s.cam_idx, s.pnt_starts, prob.npnts,
        hpp_inv_f=s.Hpp_inv_f, add_gp=s.g_p_f, sign=-1.0, interpret=True)
    assert float(jnp.max(jnp.abs(got_dp - dp))) <= _tol(dp)


def test_cam_reduce_matches_scatter(sys_v):
    prob, s, v = sys_v
    t_obs = jnp.asarray(
        np.random.default_rng(2).standard_normal((prob.nobs_pad, 3)),
        dtype=jnp.float32)
    oracle = segment_sum_scatter(
        w_dot_b(s.W_f, t_obs), s.cam_idx, prob.ncams)
    W_cam_t = pallas_schur.to_k_minor(s.W_f)[:, s.cam_perm]
    got = pallas_schur.wt_cam_reduce(
        W_cam_t, pallas_schur.pad_rows(t_obs.T, 8)[:, s.cam_perm],
        s.cam_idx[s.cam_perm], s.cam_starts, prob.ncams, interpret=True)
    assert float(jnp.max(jnp.abs(got - oracle))) <= _tol(oracle)


def test_schur_matvec_dispatch(sys_v):
    prob, s, v = sys_v
    oracle = schur.schur_matvec(s, v)
    blocks = assemble_blocks(prob)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        s2 = schur.reduce_system(prob, blocks, 1e-2)
        assert s2.W_t is not None and s2.W_cam_t is not None
        assert float(jnp.max(jnp.abs(s2.b - s.b))) <= _tol(s.b)
        got = schur.schur_matvec(s2, v)
        dc = jnp.asarray(
            np.random.default_rng(3).standard_normal((prob.ncams, 9)),
            dtype=jnp.float32)
        got_dp = schur.back_substitute(s2, dc)
    finally:
        pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET = old
    assert float(jnp.max(jnp.abs(got - oracle))) <= _tol(oracle)
    dp = schur.back_substitute(s, dc)
    assert float(jnp.max(jnp.abs(got_dp - dp))) <= _tol(dp)


def test_point_reduce_fold_k8(sys_v):
    """Combined in-kernel Hpp_inv fold + k-minor (8, npnts) output — the
    matvec's point pass when W (not Y) is the streamed operand."""
    prob, s, v = sys_v
    t = segment_sum_scatter(
        wT_dot_a(s.W_f, v[s.cam_idx]), s.pnt_idx, prob.npnts)
    folded = jnp.einsum("pab,pb->pa", s.Hpp_inv, t)
    got8 = pallas_schur.wtv_point_reduce(
        pallas_schur.to_k_minor(s.W_f), v, s.pnt_idx, s.cam_idx,
        s.pnt_starts, prob.npnts, hpp_inv_f=s.Hpp_inv_f, out_k8=True,
        interpret=True)
    assert got8.shape == (8, prob.npnts)
    assert float(jnp.max(jnp.abs(got8[:3] - folded.T))) <= _tol(folded)
    assert float(jnp.max(jnp.abs(got8[3:]))) == 0.0


def test_wcw_cam_reduce(sys_v):
    """Fused Schur-diagonal correction vs the einsum + scatter oracle."""
    prob, s, _ = sys_v
    Hpp_inv_obs = s.Hpp_inv[s.pnt_idx]
    WCW = jnp.einsum("kab,kbc,kdc->kad", s.W, Hpp_inv_obs, s.W)
    oracle = segment_sum_scatter(WCW, s.cam_idx, prob.ncams)
    W_cam_t = pallas_schur.to_k_minor(s.W_f)[:, s.cam_perm]
    c6 = pallas_schur.hpp_inv_sym6_t(s.Hpp_inv_f, s.pnt_idx[s.cam_perm])
    got = pallas_schur.wcw_cam_reduce(
        W_cam_t, c6, s.cam_idx[s.cam_perm], s.cam_starts, prob.ncams,
        interpret=True)
    assert float(jnp.max(jnp.abs(got.reshape(-1, 9, 9) - oracle))) <= _tol(
        oracle)


def test_schur_diag_pallas_dispatch(sys_v):
    prob, s, _ = sys_v
    oracle = schur.schur_diag_blocks(s)
    blocks = assemble_blocks(prob)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        s2 = schur.reduce_system(prob, blocks, 1e-2)
        got = schur.schur_diag_blocks(s2)
    finally:
        pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET = old
    assert float(jnp.max(jnp.abs(got - oracle))) <= _tol(oracle)


def test_gather_k_minor_chunked_matches_direct(monkeypatch):
    """Chunked (Final-scale) k-minor gather / transpose == the direct
    forms, including the non-divisible remainder tail."""
    rng = np.random.default_rng(7)
    t16 = jnp.asarray(rng.standard_normal((16, 37)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 37, size=2 * 300 + 17), jnp.int32)
    direct = t16[:, idx]
    W_f = jnp.asarray(rng.standard_normal(617 * 27), jnp.float32)
    k_direct = pallas_schur.to_k_minor(W_f)
    from bundleadjustment_jl_tpu.ops.normal import inv3x3_damped_flat
    spd = rng.standard_normal((617, 3, 3)).astype(np.float32)
    spd = np.einsum("pij,pkj->pik", spd, spd)
    Hpp_f = jnp.asarray(spd.reshape(-1))
    inv_direct = inv3x3_damped_flat(Hpp_f, 0.3)
    monkeypatch.setattr(pallas_schur, "GATHER_DIRECT_MAX_BYTES", 0)
    monkeypatch.setattr(pallas_schur, "GATHER_CHUNK", 300)
    np.testing.assert_array_equal(
        np.asarray(pallas_schur.gather_k_minor(t16, idx)),
        np.asarray(direct))
    np.testing.assert_array_equal(
        np.asarray(pallas_schur.to_k_minor(W_f)), np.asarray(k_direct))
    # elementwise math is identical; only FMA contraction may differ
    # between the fused direct form and the fori_loop body
    np.testing.assert_allclose(
        np.asarray(inv3x3_damped_flat(Hpp_f, 0.3)),
        np.asarray(inv_direct), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("chunked_final", [False, True])
def test_solver_non_kminor_pallas_matches_kminor(monkeypatch,
                                                 chunked_final):
    """The Final-scale fallback configuration: Pallas mode ON but the
    k-minor carried assembly disabled (nobs > KMINOR_MAX_OBS there).  The
    solver converts W_f to carried k-minor operands once per accept and
    still runs the fused matvec / back-substitution / quad-form streams —
    the XLA (n, 27) forms tile-pad to a measured 14.9 GB compile-time OOM
    at Final-13682 (logs/probe_final_compile.log).

    ``chunked_final=True`` additionally forces every size threshold to
    its Final-scale branch: chunked gathers/transpose/inverse/objective,
    NO camera-sorted W copy (camera-direction reduces take the scatter
    kernel — pallas_schur.cam_reduce_scatter_ok), serialized linesearch.
    """
    from bundleadjustment_jl_tpu.solver import lm_jit

    prob, _ = synthetic_bal(ncams=8, npnts=256, obs_per_pnt=4, seed=5,
                            dtype=jnp.float32, noise_px=1.0, perturb=2e-2,
                            pad_obs_to=1024)
    opts = dict(max_iters=15, pcg_max_iters=60, lam0_mode="diag",
                facto_dtype=jnp.bfloat16)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        ref = levenberg_marquardt_jit(prob, **opts)
        # KMINOR_MAX_OBS / the byte thresholds are read at trace time:
        # clear the jit caches so the monkeypatches retrace.
        monkeypatch.setattr(lm_jit, "KMINOR_MAX_OBS", 0)
        if chunked_final:
            monkeypatch.setattr(pallas_schur, "GATHER_DIRECT_MAX_BYTES", 0)
            monkeypatch.setattr(pallas_schur, "GATHER_CHUNK", 512)
        lm_jit._lm_init.clear_cache()
        lm_jit._lm_run.clear_cache()
        try:
            got = levenberg_marquardt_jit(prob, **opts)
        finally:
            lm_jit._lm_init.clear_cache()
            lm_jit._lm_run.clear_cache()
    finally:
        pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET = old
    assert int(got.iterations) == int(ref.iterations)
    robj = float(ref.objective)
    assert abs(float(got.objective) - robj) <= 1e-4 * max(1.0, robj)


def test_kminor_solver_final_scale_branch(monkeypatch):
    """The Final-13682 k-minor configuration (round 4): huge-n thresholds
    force (a) chunk-safe operand gathers in `pack_operands`, (b) the
    one-hot scatter d90 camera reduce in assembly (no JR_cam_t copy),
    and (c) a carried cam-sorted W built via the flat row gather. Must
    match the default kminor solve decision-for-decision."""
    from bundleadjustment_jl_tpu.solver import lm_jit

    prob, _ = synthetic_bal(ncams=8, npnts=256, obs_per_pnt=4, seed=5,
                            dtype=jnp.float32, noise_px=1.0, perturb=2e-2,
                            pad_obs_to=1024)
    opts = dict(max_iters=15, pcg_max_iters=60, lam0_mode="diag",
                facto_dtype=jnp.bfloat16)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        ref = levenberg_marquardt_jit(prob, **opts)
        # Force every huge-n branch (thresholds are read at trace time).
        monkeypatch.setattr(pallas_schur, "GATHER_DIRECT_MAX_BYTES", 0)
        monkeypatch.setattr(pallas_schur, "GATHER_CHUNK", 512)
        lm_jit._lm_init.clear_cache()
        lm_jit._lm_run.clear_cache()
        try:
            # The huge branch must produce a carried cam-sorted W and
            # the same assembly blocks.
            from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
            got_b = assemble_blocks(prob, with_jr=False, kminor=True,
                                    w_dtype=jnp.bfloat16)
            assert got_b.W_cam_t is not None
            assert got_b.W_cam_t.dtype == jnp.bfloat16
            ref_b = assemble_blocks(prob, with_jr=False)
            for name in ("g_c_f", "g_p_f", "Hcc_f", "Hpp_f"):
                a, b = getattr(got_b, name), getattr(ref_b, name)
                assert float(jnp.max(jnp.abs(a - b))) <= _tol(b), name
            got = levenberg_marquardt_jit(prob, **opts)
        finally:
            lm_jit._lm_init.clear_cache()
            lm_jit._lm_run.clear_cache()
    finally:
        pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET = old
    assert int(got.iterations) == int(ref.iterations)
    robj = float(ref.objective)
    assert abs(float(got.objective) - robj) <= 1e-4 * max(1.0, robj)


def test_kminor_assembly_matches_xla():
    """Fused-kernel assembly == XLA assembly on every block, and the
    k-minor W operands match the transposed/permuted W_f."""
    prob, _ = synthetic_bal(ncams=11, npnts=200, obs_per_pnt=4, seed=5,
                            dtype=jnp.float32, perturb=1e-2)
    ref = assemble_blocks(prob, with_jr=False)
    old = pallas_schur.INTERPRET
    try:
        pallas_schur.INTERPRET = True
        got = assemble_blocks(prob, with_jr=False, kminor=True)
    finally:
        pallas_schur.INTERPRET = old
    for name in ("g_c_f", "g_p_f", "Hcc_f", "Hpp_f"):
        a, b = getattr(got, name), getattr(ref, name)
        assert float(jnp.max(jnp.abs(a - b))) <= _tol(b), name
    assert abs(float(got.obj) - float(ref.obj)) <= _tol(ref.obj)
    assert got.W_f is None
    W_t_ref = pallas_schur.to_k_minor(ref.W_f)
    assert float(jnp.max(jnp.abs(got.W_t - W_t_ref))) <= _tol(W_t_ref)
    assert float(jnp.max(jnp.abs(
        got.W_cam_t - W_t_ref[:, prob.cam_perm]))) <= _tol(W_t_ref)


def test_kminor_assembly_block_sizes():
    """The linearize kernel's grid tiling: different BLOCK_COLS (128 vs
    the default, i.e. many small grid steps vs few big ones) produce
    identical blocks."""
    from bundleadjustment_jl_tpu.ops import pallas_linearize
    prob, _ = synthetic_bal(ncams=7, npnts=300, obs_per_pnt=4, seed=6,
                            dtype=jnp.float32, perturb=1e-2)
    old = pallas_schur.INTERPRET
    old_bc = pallas_linearize.BLOCK_COLS
    try:
        pallas_schur.INTERPRET = True
        whole = assemble_blocks(prob, with_jr=False, kminor=True)
        pallas_linearize.BLOCK_COLS = 128
        tiled = assemble_blocks(prob, with_jr=False, kminor=True)
    finally:
        pallas_schur.INTERPRET = old
        pallas_linearize.BLOCK_COLS = old_bc
    for name in ("g_c_f", "g_p_f", "Hcc_f", "Hpp_f", "W_t", "W_cam_t"):
        a, b = getattr(tiled, name), getattr(whole, name)
        assert float(jnp.max(jnp.abs(a - b))) <= _tol(b), name


def test_quad_form_kminor(sys_v):
    prob, s, v = sys_v
    blocks = assemble_blocks(prob, with_jr=False)
    rng = np.random.default_rng(7)
    dc = jnp.asarray(rng.standard_normal((prob.ncams, 9)), jnp.float32)
    dp = jnp.asarray(rng.standard_normal((prob.npnts, 3)), jnp.float32)
    oracle = schur.quad_form(prob, blocks, dc, dp)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        blocks_k = assemble_blocks(prob, with_jr=False, kminor=True)
        got = schur.quad_form(prob, blocks_k, dc, dp)
    finally:
        pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET = old
    assert abs(float(got) - float(oracle)) <= _tol(oracle)


def test_lm_jit_pallas_f16_facto():
    """f16 W storage through the fused kminor path: assembly stays f32,
    the cast applies the range-equilibration scale, and the solve reaches
    the f32 objective (the hatted-operand exactness of `ops/schur.py`)."""
    prob, _ = synthetic_bal(ncams=9, npnts=150, obs_per_pnt=4, seed=3,
                            dtype=jnp.float32, perturb=1e-2)
    kw = dict(max_iters=30, lam0_mode="diag", satol=0.0, srtol=0.0,
              atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        ref = levenberg_marquardt_jit(prob, **kw)
        got = levenberg_marquardt_jit(prob, facto_dtype=jnp.float16, **kw)
    finally:
        pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET = old
    assert jnp.isfinite(got.objective)
    assert abs(float(got.objective) - float(ref.objective)) <= (
        2e-2 * (1.0 + abs(float(ref.objective))))


@pytest.mark.parametrize("max_cams", [1024, 4])
def test_lm_jit_pallas_parity(max_cams):
    """Full jitted LM solve, Pallas on == off; both camera-gather branches."""
    prob, _ = synthetic_bal(ncams=9, npnts=150, obs_per_pnt=4, seed=3,
                            dtype=jnp.float32, perturb=1e-2)
    ref = levenberg_marquardt_jit(prob, max_iters=15)
    old = (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
           pallas_schur.GATHER_TABLE_MAX_CAMS)
    try:
        pallas_schur.set_mode(True)
        pallas_schur.INTERPRET = True
        pallas_schur.GATHER_TABLE_MAX_CAMS = max_cams
        got = levenberg_marquardt_jit(prob, max_iters=15)
    finally:
        (pallas_schur.PALLAS_MODE, pallas_schur.INTERPRET,
         pallas_schur.GATHER_TABLE_MAX_CAMS) = old
    assert int(got.iterations) == int(ref.iterations)
    assert abs(float(got.objective) - float(ref.objective)) <= (
        1e-4 * (1.0 + abs(float(ref.objective))))
