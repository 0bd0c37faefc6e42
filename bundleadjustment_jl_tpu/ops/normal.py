"""Block assembly of the damped Gauss-Newton (normal-equation) system.

The reference factors the sparse augmented system
``K = [[I J];[J' -lambda I]]`` with a custom LDL^T
(`/root/reference/src/ldl_aux.jl`) or SPQR (`src/qr_aux.jl`), relying on
AMD/METIS orderings to contain fill. The TPU-native formulation exploits the
*block* structure of bundle adjustment instead (SURVEY.md §2.2): the
Gauss-Newton matrix of ``J = [Jc | Jp]`` is

    H = [[Hcc, Hcp], [Hcp', Hpp]]

where ``Hcc`` is block-diagonal with 9x9 camera blocks, ``Hpp`` is
block-diagonal with 3x3 point blocks, and ``Hcp`` has one 9x3 block ``W_k``
per observation (each (cam, pnt) pair appears in at most one observation in
BAL data). All blocks are assembled as batched einsums + `segment_sum` —
dense, static-shaped, mesh-shardable along the observation axis.

Damping is the reference's Levenberg ``lambda * I`` (the LDL system
``[[I J];[J' -lambda I]]`` is the augmented form of
``(J'J + lambda I) delta = -J'r``, `src/lm.jl:68-81`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bundleadjustment_jl_tpu.models.problem import BAProblem
from bundleadjustment_jl_tpu.ops.jacobian import residuals_and_jacobian
from bundleadjustment_jl_tpu.ops.segsum import (
    segment_sum_scatter, sorted_segment_sum)


def seg_by_pnt(problem: BAProblem, values: jnp.ndarray) -> jnp.ndarray:
    """Per-observation values -> per-point sums (scan path only when
    segsum.SORTED_MODE is enabled; see the measured verdict there)."""
    from bundleadjustment_jl_tpu.ops import segsum
    if segsum.SORTED_MODE and problem.pnt_starts is not None:
        if problem.pnt_perm is not None:
            values = values[problem.pnt_perm]
        return sorted_segment_sum(values, problem.pnt_starts)
    return segment_sum_scatter(values, problem.pnt_idx, problem.npnts)


def seg_by_cam(problem: BAProblem, values: jnp.ndarray) -> jnp.ndarray:
    """Per-observation values -> per-camera sums."""
    from bundleadjustment_jl_tpu.ops import segsum
    if segsum.SORTED_MODE and problem.cam_perm is not None:
        return sorted_segment_sum(values[problem.cam_perm],
                                  problem.cam_starts)
    return segment_sum_scatter(values, problem.cam_idx, problem.ncams)


class GNBlocks(NamedTuple):
    """Damped Gauss-Newton system in block form (all batched-dense).

    Storage is FLAT (1-D) per array: TPU XLA tile-pads the minor dims of
    persistent N-major arrays with tiny trailing dims — measured 75.9x
    expansion for a while-carried f32[N,9,3] ({2,1,0:T(8,128)} layout) —
    while 1-D buffers stay packed. The shaped views (``r``, ``Jc``, ``Jp``,
    ``W``, ...) are zero-cost reshapes fused into consumers.

    ``r_f``/``Jc_f``/``Jp_f`` are ``None`` when assembled with
    ``with_jr=False`` (the hot-solver configuration): the LM step needs only
    the reduced quantities — ``obj`` (folded into assembly) and the step
    quadratic form ``||J d||^2`` via :func:`...ops.schur.quad_form` — so the
    (nobs, 26) raw residual/Jacobian arrays are never written to HBM.
    """
    g_c_f: jnp.ndarray   # flat (ncams*9,)    J_c' r
    g_p_f: jnp.ndarray   # flat (npnts*3,)    J_p' r
    Hcc_f: jnp.ndarray   # flat (ncams*81,)   camera diagonal blocks
    Hpp_f: jnp.ndarray   # flat (npnts*9,)    point diagonal blocks
    W_f: jnp.ndarray     # flat (nobs_pad*27,) per-observation Hcp blocks
    obj: jnp.ndarray     # scalar 0.5 ||r||^2 at the linearization point
    r_f: jnp.ndarray | None = None   # flat (nobs_pad*2,) weighted residuals
    Jc_f: jnp.ndarray | None = None  # flat (nobs_pad*18,)
    Jp_f: jnp.ndarray | None = None  # flat (nobs_pad*6,)
    # k-minor W operands (kminor=True assembly; then W_f is None): the
    # (32, nobs_pad) point-sorted / camera-sorted layouts the fused Pallas
    # kernels stream. Lambda-independent — carried across lambda changes
    # so rejected LM iterations never rebuild/re-permute W.
    W_t: jnp.ndarray | None = None
    W_cam_t: jnp.ndarray | None = None
    # Range-equilibration scale for low-precision W storage (the heir of
    # the reference's `normalize_F16!` global range scale,
    # `/root/reference/src/lma_aux.jl:27-52` wired at `lm.jl:165-169`):
    # the stored W arrays hold ``s * W`` with ``s`` a power of two chosen
    # so the largest entry fits the storage dtype's range (f16 max
    # 65504; BAL focals ~400-1000 put raw |W| ~ f^2 >> that). Exactness:
    # this is the variable scaling dp = s * dp_hat — the Schur system
    # S, b are invariant (W enters them once with Hpp_inv and once
    # squared with Hpp_inv once), and consumers hat Hpp_inv by 1/s^2,
    # g_p by s, and unscale dp at the exits (`ops/schur.py`). None = 1.
    w_scale: jnp.ndarray | None = None

    @property
    def g_c(self):
        return self.g_c_f.reshape(-1, 9)

    @property
    def g_p(self):
        return self.g_p_f.reshape(-1, 3)

    @property
    def Hcc(self):
        return self.Hcc_f.reshape(-1, 9, 9)

    @property
    def Hpp(self):
        return self.Hpp_f.reshape(-1, 3, 3)

    @property
    def W(self):
        return self.W_f.reshape(-1, 9, 3)

    @property
    def r(self):
        return self.r_f.reshape(-1, 2)

    @property
    def Jc(self):
        return self.Jc_f.reshape(-1, 2, 9)

    @property
    def Jp(self):
        return self.Jp_f.reshape(-1, 2, 3)

    @classmethod
    def from_shaped(cls, g_c, g_p, Hcc, Hpp, W, obj, r=None, Jc=None,
                    Jp=None):
        flat = lambda x: None if x is None else x.reshape(-1)  # noqa: E731
        return cls(g_c.reshape(-1), g_p.reshape(-1), Hcc.reshape(-1),
                   Hpp.reshape(-1), W.reshape(-1), obj, flat(r),
                   flat(Jc), flat(Jp))


# Streaming-chunk rows for lax.scan-based assembly/diag at large nobs.
# Each scan step is a serialized device dispatch, so steps = n/CHUNK_ROWS
# bounds throughput; each step materializes ~8 KB/obs of linearization
# temps, so CHUNK_ROWS bounds memory (Venice-scale full width OOMs HBM,
# measured at 1.25M obs). 2^16 = ~70 steps at Venice / ~21 at
# Dubrovnik-356 with ~0.5 GB of temps per step. Never go near 512:
# thousands of scan steps crash the experimental TPU runtime (measured).
# Overridable via BA_CHUNK for A/B runs (read at import).
import os as _os
CHUNK_ROWS = int(_os.environ.get("BA_CHUNK", 1 << 16))


def auto_chunk(n: int, threshold: int = 1 << 18) -> int | None:
    """Observation-chunk size for streaming assembly: None for small
    problems (whole-width is fastest), else :data:`CHUNK_ROWS` (the
    remainder is handled by callers as one tail block)."""
    return None if n <= threshold else CHUNK_ROWS


def assemble_blocks(problem: BAProblem, cams=None, points=None,
                    chunk: int | str | None = "auto",
                    with_jr: bool = True,
                    kminor: bool = False,
                    w_dtype=None) -> GNBlocks:
    """Linearize at (cams, points) and assemble all Gauss-Newton blocks.

    One fused pass: residuals, Jacobian blocks, gradients and Hessian blocks.
    Padded observations carry zero Jacobians/residuals so every segment_sum
    is exact. This replaces the reference's sparse-matrix assembly
    (`src/lm.jl:61-81`) and its COO SpMV ``J'r`` (`src/lma_aux.jl:191-212`).

    ``chunk``: stream the observation axis through a `lax.scan` in chunks of
    this size (bounding temp memory); "auto" picks via :func:`auto_chunk`.

    ``with_jr=False`` (hot-solver path): do not keep the per-observation
    ``r``/``Jc``/``Jp`` arrays — the LM iteration only needs the reduced
    blocks, the folded-in ``obj``, and `ops.schur.quad_form` for the step
    quadratic. Saves ~104 B/obs of HBM writes + the same in later reads.

    ``kminor=True`` (fused-Pallas solver path; requires the sorted layout
    and ``with_jr=False``): produce the Hessian/gradient blocks with the
    fused streaming reduce kernels (`ops/pallas_schur.py`) instead of XLA
    scatter-adds, and return W in the k-minor point-/camera-sorted layouts
    the fused solve streams (``W_f`` is None on this path).
    """
    cams = problem.cams if cams is None else cams
    points = problem.points if points is None else points
    n = problem.nobs_pad
    if chunk == "auto":
        chunk = auto_chunk(n)
    if kminor:
        assert not with_jr, "kminor assembly is the with_jr=False hot path"
        return _assemble_kminor(problem, cams, points, chunk,
                                w_dtype=w_dtype)
    from bundleadjustment_jl_tpu.ops.blockmul import (
        jcT_dot, jjT_outer, jpT_dot)
    from bundleadjustment_jl_tpu.ops import spmdctx
    if chunk is None or n <= chunk:
        r, Jc, Jp = residuals_and_jacobian(problem, cams, points)
        Jc_f, Jp_f = Jc.reshape(-1), Jp.reshape(-1)
        # spmd (`solver/lm_spmd.py`): rows are device-local, so the
        # camera-space outputs (obj, g_c, Hcc) are per-device partials
        # that all-reduce over the mesh axis; point-space outputs
        # (g_p, Hpp, W) stay local (points are shard-owned). No-ops
        # outside a shard_map (spmdctx.AXIS is None).
        obj = spmdctx.psum(0.5 * jnp.sum(r * r))
        g_c = spmdctx.psum(seg_by_cam(problem, jcT_dot(Jc_f, r)))
        g_p = seg_by_pnt(problem, jpT_dot(Jp_f, r))
        Hcc = spmdctx.psum(
            seg_by_cam(problem, jjT_outer(Jc_f, 9, Jc_f, 9))).reshape(
            -1, 9, 9)
        Hpp = seg_by_pnt(problem, jjT_outer(Jp_f, 3, Jp_f, 3)).reshape(
            -1, 3, 3)
        W = jjT_outer(Jc_f, 9, Jp_f, 3)
        if w_dtype is not None:
            W = W.astype(w_dtype)
        if not with_jr:
            r = Jc = Jp = None
        return GNBlocks.from_shaped(g_c, g_p, Hcc, Hpp, W, obj, r, Jc, Jp)

    from bundleadjustment_jl_tpu.ops.jacobian import rj_raw
    from bundleadjustment_jl_tpu.ops.segsum import segment_sum_scatter
    nchunks = n // chunk          # remainder rows handled as one tail block
    nfull = nchunks * chunk
    rem = n - nfull
    nc, np_ = problem.ncams, problem.npnts
    dt = cams.dtype

    def block(ci, pi, xy_f, w, m):
        """One chunk's contributions (m = rows in this block).

        Accumulator shapes stay FLAT 1-D: (npnts, 3, 3)-shaped scan
        carries can be tile-padded by the TPU layout assigner (measured
        up to 113x for {2,1,0:T(8,128)}); flat carries stay packed."""
        r, Jc, Jp = rj_raw(cams, points, ci, pi, xy_f.reshape(m, 2), w)
        Jc_f, Jp_f = Jc.reshape(-1), Jp.reshape(-1)
        return (0.5 * jnp.sum(r * r),
                segment_sum_scatter(jcT_dot(Jc_f, r), ci, nc).reshape(-1),
                segment_sum_scatter(jpT_dot(Jp_f, r), pi, np_).reshape(-1),
                segment_sum_scatter(jjT_outer(Jc_f, 9, Jc_f, 9), ci,
                                    nc).reshape(-1),
                segment_sum_scatter(jjT_outer(Jp_f, 3, Jp_f, 3), pi,
                                    np_).reshape(-1),
                jjT_outer(Jc_f, 9, Jp_f, 3),
                (r, Jc_f, Jp_f))

    # NB: scan xs/ys buffers keep the per-step shape as minor dims, and TPU
    # tile-pads minor dims (2,9)->(8,128) etc. — measured 4+ GB of padding
    # copies at 1.4M obs. The 1-D per-step arrays therefore travel FLAT
    # (chunk*d,) and are reshaped outside the scan (both sides packed
    # row-major -> free). pt2d must NOT travel as xs at all: every
    # whole-array reform of the (n, 2) input — the xs slice directly
    # (round 2), `pt2d.reshape(-1)` (round-3 first retry), and the same
    # reshape behind an optimization_barrier (second retry) — made XLA
    # materialize a T(8,128)-layout copy of all n rows: 64x padding,
    # 14.9 GB, the measured _lm_init OOM at Final-13682
    # (logs/r3b/driver2.log). Instead each step dynamic-slices its
    # (chunk, 2) window straight out of the parameter inside the body —
    # only the per-chunk window ever materializes.
    xs = (problem.cam_idx[:nfull].reshape(nchunks, chunk),
          problem.pnt_idx[:nfull].reshape(nchunks, chunk),
          jnp.arange(nchunks, dtype=jnp.int32) * chunk,
          problem.w[:nfull].reshape(nchunks, chunk))
    carry0 = (jnp.zeros((nc * 9,), dt), jnp.zeros((np_ * 3,), dt),
              jnp.zeros((nc * 81,), dt), jnp.zeros((np_ * 9,), dt),
              jnp.zeros((), dt))

    # Cast each W chunk to the storage dtype INSIDE the scan (bf16
    # facto): the stacked ys buffer is then (n*27,) in w_dtype and the
    # full-width f32 W (3.4 GB at Final-13682) never exists. f16 cannot
    # take this path (range scale needs the global max first,
    # `_maybe_cast_facto`) — its callers pass w_dtype=None here.
    wd = dt if w_dtype is None else jnp.dtype(w_dtype)

    def body(carry, x):
        g_c, g_p, Hcc, Hpp, obj = carry
        ci, pi, row0, w = x
        xy = jax.lax.dynamic_slice(
            problem.pt2d, (row0, jnp.zeros((), row0.dtype)),
            (chunk, 2))
        dobj, dg_c, dg_p, dHcc, dHpp, W, (r, Jc_f, Jp_f) = block(
            ci, pi, xy.reshape(-1), w, chunk)
        ys = (W.reshape(-1).astype(wd),) if not with_jr else (
            W.reshape(-1).astype(wd), r.reshape(-1), Jc_f, Jp_f)
        return (g_c + dg_c, g_p + dg_p, Hcc + dHcc, Hpp + dHpp,
                obj + dobj), ys

    (g_c, g_p, Hcc, Hpp, obj), ys = jax.lax.scan(body, carry0, xs)
    W = ys[0].reshape(-1)
    r, Jc, Jp = (ys[1], ys[2], ys[3]) if with_jr else (None, None, None)
    flat = lambda x: None if x is None else x.reshape(-1)  # noqa: E731
    r, Jc, Jp = flat(r), flat(Jc), flat(Jp)
    if rem:
        dobj, dg_c, dg_p, dHcc, dHpp, W_t, (r_t, Jc_t, Jp_t) = block(
            problem.cam_idx[nfull:], problem.pnt_idx[nfull:],
            problem.pt2d[nfull:].reshape(-1), problem.w[nfull:], rem)
        obj = obj + dobj
        g_c, g_p = g_c + dg_c, g_p + dg_p
        Hcc, Hpp = Hcc + dHcc, Hpp + dHpp
        W = jnp.concatenate([W, W_t.reshape(-1).astype(wd)])
        if with_jr:
            r = jnp.concatenate([r, r_t.reshape(-1)])
            Jc = jnp.concatenate([Jc, Jc_t])
            Jp = jnp.concatenate([Jp, Jp_t])
    # spmd: one camera-space all-reduce after the streaming accumulation
    # (see the whole-width branch above); point-space stays local.
    return GNBlocks(
        g_c_f=spmdctx.psum(g_c), g_p_f=g_p,
        Hcc_f=spmdctx.psum(Hcc), Hpp_f=Hpp,
        W_f=W, obj=spmdctx.psum(obj), r_f=r, Jc_f=Jc, Jp_f=Jp)


def _assemble_kminor(problem: BAProblem, cams, points,
                     chunk: int | None, w_dtype=None) -> GNBlocks:
    """Fused-kernel assembly: linearize into a stacked k-minor array and
    reduce with the Pallas segment-product kernels (no scatter anywhere).

    Layout: ``JR_t`` (32, nobs_pad) — rows 0-17 Jc (j = 9i+a), 18-23 Jp
    (3i+b), 24-25 r, 26-31 zero (`pallas_schur._JC0/_JP0/_R0`) — in the
    native point-sorted row order; ``JR_cam_t`` the camera-sorted lane
    permutation.  The linearization itself runs as a Pallas kernel
    (`ops/pallas_linearize.py`: the whole chain scalarized per lane —
    the XLA scan formulation was measured at 1.8 GB/s, 184 of 237 ms of
    assembly at Dubrovnik-356, from tile-padded (m, 2, 9) intermediates)
    and emits W_t in the same pass.  One streaming reduce kernel per
    direction produces [Hcc | g_c] (90/camera) and [Hpp | g_p]
    (12/point).  W_t/W_cam_t are lambda-independent and carried.

    ``chunk`` is unused on this path (the kernel streams in blocks); it
    remains in the signature for call symmetry with the XLA assembly.
    """
    del chunk
    from bundleadjustment_jl_tpu.ops import (
        pallas_linearize, pallas_schur, spmdctx)
    dt = cams.dtype
    if (pallas_schur.cam_scatter_ok(problem, problem.ncams)
            and problem.ncams <= pallas_schur.GATHER_TABLE_MAX_CAMS):
        # fully-fused single-pass assembly (`ops/pallas_assemble.py`):
        # the stacked JR array never exists; ~160 B/row of HBM traffic
        # vs ~640 for the split linearize + reduce pipeline.
        from bundleadjustment_jl_tpu.ops import pallas_assemble
        bounds = pallas_schur.tile_bounds(problem.pnt_starts,
                                          problem.npnts)
        ntiles = bounds.shape[0] - 1
        pw = pallas_assemble.pack_pw(problem)
        C = pallas_schur._chunk_rows(problem.nobs_pad)
        pts16 = pallas_assemble.pad_points(points, ntiles, C)
        W_t, outp, out_c, obj = pallas_assemble.assemble_scatter(
            pw, pts16, cams.astype(jnp.float32), bounds, problem.ncams,
            problem.npnts, out_dtype=jnp.dtype(w_dtype or dt))
        obj = spmdctx.psum(obj[0, 0].astype(dt))
        out_c = spmdctx.psum(out_c)
        out_p = outp[:problem.npnts]
        return GNBlocks(
            g_c_f=out_c[:, 81:90].astype(dt).reshape(-1),
            g_p_f=out_p[:, 9:12].astype(dt).reshape(-1),
            Hcc_f=out_c[:, :81].astype(dt).reshape(-1),
            Hpp_f=out_p[:, :9].astype(dt).reshape(-1),
            W_f=None, obj=obj,
            W_t=W_t if w_dtype else W_t.astype(dt),
            W_cam_t=None)
    cxw = pallas_linearize.pack_operands(
        cams, points, problem.cam_idx, problem.pnt_idx, problem.pt2d,
        problem.w)
    JR_t, W_t = pallas_linearize.linearize_w_kminor(cxw, w_dtype=w_dtype)
    # spmd: objective and camera-space blocks sum over the mesh axis
    # (rows are device-local); point-space blocks stay local.
    obj = spmdctx.psum(0.5 * jnp.sum(JR_t[24:26] ** 2))
    # A full camera-sorted JR copy stops paying at Final scale: JR_cam_t
    # is another 4.0 GB f32 resident and its lane permutation takes the
    # relayout-unsafe huge-n gather path. There, reduce the camera
    # blocks with the one-hot scatter kernel instead (O(ncams*C) MXU
    # work, but ONCE per accepted step, not per matvec).
    huge = (JR_t.shape[1] * 128 * 4
            > pallas_schur.GATHER_DIRECT_MAX_BYTES)
    if pallas_schur.cam_scatter_ok(problem, problem.ncams) or huge:
        # camera-scatter mode: camera-direction reduces stream the
        # point-sorted arrays directly — the camera-sorted JR lane
        # permutation (256 B/row of gather traffic and 4 GB of HBM
        # residency at Final) is never built.
        bounds = pallas_schur.tile_bounds(problem.pnt_starts,
                                          problem.npnts)
        out_c = spmdctx.psum(pallas_schur.cam_scatter_reduce(
            JR_t, problem.cam_idx, bounds, problem.ncams, d_out=90,
            prod=pallas_schur._prod_cam90))
        W_cam_t = None
        if huge and not pallas_schur.cam_scatter_ok(problem,
                                                    problem.ncams):
            # Fallback for huge problems with camera-scatter mode OFF
            # (BA_CAM_SCATTER=0 or ncams beyond CAM_SCATTER_MAX_CAMS).
            # Round 5's factorized scatter made the scatter route the
            # Final default (d9 scatter 214 ms vs segsum 43 + operand
            # gather 382 ms per matvec, logs/abtest_r5.log), so this
            # branch no longer runs at Final; the numbers below are the
            # round-3/4 FLAT-one-hot measurements that motivated it.
            # The per-MATVEC camera reduce here wants the cam-sorted W
            # (segsum 95 ms vs flat one-hot scatter 1709 ms per matvec
            # at ncams=13682, logs/r3e/abtest.log). Permuting W_t costs
            # 9.6 s per accept (32 random-access row gathers at
            # ~0.8 GB/s, logs/r4/final_profile_r4c.log); RE-LINEARIZING
            # on camera-sorted operands streams at kernel rate and is
            # bit-identical (same per-lane f32 chain).
            # Operand rows built in k-minor form throughout — a row
            # gather of the (n, 2) pt2d would tile-pad 2 -> 128 lanes
            # (16 GB at Final); the (2, n) transpose + 2-row flat
            # gather stays packed. The build runs in HALF-width slices:
            # one whole-width (16, n) f32 operand is 2.0 GB live on top
            # of JR_t/W_t, the measured ~0.2 GB HBM overflow at Final
            # (/tmp/probe_trialfix3, round 4).
            perm = problem.cam_perm
            n_pad = perm.shape[0]
            # Both half-slices must stay block-aligned for
            # `linearize_w_only` (its grid is m // _block_cols(m)):
            # round the split down to a 128 multiple (the _block_cols
            # floor, so both slices resolve a dividing width) and fail
            # loudly if the padding invariant ever changes (advisor,
            # round 4 — a misaligned slice must not zero W columns).
            half = (n_pad // 2) // 128 * 128
            for m in (half, n_pad - half):
                if m % pallas_linearize._block_cols(m):
                    raise ValueError(
                        f"relinearization slice {m} not a multiple of "
                        f"its block width at n_pad={n_pad}")
            xy_t = problem.pt2d.T
            cams_t16 = cams.T
            points_t16 = points.T
            out_dt = jnp.dtype(w_dtype) if w_dtype else jnp.float32
            W_cam_t = jnp.zeros((32, n_pad), out_dt)
            for lo, m in ((0, half), (half, n_pad - half)):
                perm_s = jax.lax.dynamic_slice(perm, (lo,), (m,))
                ci_cs = problem.cam_idx[perm_s]
                pi_cs = problem.pnt_idx[perm_s]
                xy_cs = pallas_schur.gather_k_minor(xy_t, perm_s)
                w_cs = problem.w[perm_s].reshape(1, -1)
                c_t = pallas_schur.gather_k_minor(cams_t16, ci_cs)
                x_t = pallas_schur.gather_k_minor(points_t16, pi_cs)
                cxw_cs = jnp.concatenate(
                    [c_t, x_t, xy_cs, w_cs, jnp.zeros_like(w_cs)],
                    axis=0).astype(jnp.float32)
                W_cam_t = jax.lax.dynamic_update_slice(
                    W_cam_t, pallas_linearize.linearize_w_only(
                        cxw_cs, w_dtype=out_dt), (0, lo))
            if not w_dtype:
                W_cam_t = W_cam_t.astype(dt)
    else:
        cam_perm = problem.cam_perm
        JR_cam_t = JR_t[:, cam_perm]
        out_c = spmdctx.psum(pallas_schur.jtj_cam_reduce(
            JR_cam_t, problem.cam_idx[cam_perm], problem.cam_starts,
            problem.ncams))
        W_cam_t = W_t[:, cam_perm]
        if not w_dtype:
            W_cam_t = W_cam_t.astype(dt)
    out_p = pallas_schur.jtj_pnt_reduce(
        JR_t, problem.pnt_idx, problem.pnt_starts, problem.npnts)
    return GNBlocks(
        g_c_f=out_c[:, 81:90].astype(dt).reshape(-1),
        g_p_f=out_p[:, 9:12].astype(dt).reshape(-1),
        Hcc_f=out_c[:, :81].astype(dt).reshape(-1),
        Hpp_f=out_p[:, :9].astype(dt).reshape(-1),
        W_f=None, obj=obj,
        W_t=W_t if w_dtype else W_t.astype(dt),
        W_cam_t=W_cam_t)


def gradient_norm(blocks: GNBlocks) -> jnp.ndarray:
    """||J'r|| over the full variable vector (`src/lm.jl:57`, dual_feas).

    spmd: ``g_c`` is replicated (psummed at assembly), ``g_p`` is local
    per shard — only the point term all-reduces."""
    from bundleadjustment_jl_tpu.ops import spmdctx
    # Flat views: squaring the (npnts, 3) shaped view materializes it
    # tile-padded 42.7x (2.12 GB at Final-13682 inside the accept
    # branch, logs/r4/final_capacity_r4_relin.log allocation #2).
    return jnp.sqrt(jnp.sum(blocks.g_c_f ** 2)
                    + spmdctx.psum(jnp.sum(blocks.g_p_f ** 2)))


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form (adjugate) inverse of 3x3 SPD blocks.

    Faster than a general LU on TPU and stable for the damped point blocks
    ``Hpp + lambda I`` (lambda >= 1e-8, `src/lm.jl:337`). Half precisions
    compute in f32 and cast back (determinant products underflow in bf16).
    """
    dt = M.dtype
    if dt in (jnp.bfloat16, jnp.float16):
        return inv3x3(M.astype(jnp.float32)).astype(dt)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    # Conditioning guard: real BAL data has near-degenerate points whose
    # damped blocks can reach det <= tiny (underflow) or non-finite entries.
    # Fall back to the diagonal (Jacobi) inverse there — step stays finite
    # and roughly scaled; pathological steps are then handled by the LM
    # reject-and-grow-lambda logic instead of poisoning the whole solve.
    ok = jnp.isfinite(det) & (det > jnp.finfo(dt).tiny * 8.0)
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    adj = jnp.stack([
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, H, I], axis=-1),
    ], axis=-2)
    inv = adj * inv_det[..., None, None]
    diag = jnp.stack([a, e, i], axis=-1)
    dinv = 1.0 / jnp.maximum(jnp.where(jnp.isfinite(diag), diag, 0.0),
                             jnp.finfo(dt).tiny * 8.0)
    fallback = dinv[..., :, None] * jnp.eye(3, dtype=dt)
    return jnp.where(ok[..., None, None], inv, fallback)


def inv3x3_damped_flat(Hpp_f: jnp.ndarray, lam) -> jnp.ndarray:
    """``inv3x3(damp(Hpp, lam))`` computed entirely on flat (P, 9) columns
    (row-major j = 3a + b) — the (P, 3, 3) shaped intermediates of the
    shaped path can be materialized tile-padded ({2,1,0:T(8,128)}, up to
    113x) inside the TPU while body at BAL point counts; column slices of
    a (P, 9) view stay fused. Same conditioning guard as :func:`inv3x3`.

    At Final-13682 point counts even the flat form's stack feeds nine
    (P, 1) buffers each lane-padded to (P, 128) — 9 x 2.12 GB measured
    (logs/probe_final_compile4.log) — so very large P streams the same
    computation through a fori_loop in bounded chunks."""
    dt = Hpp_f.dtype
    if dt in (jnp.bfloat16, jnp.float16):
        return inv3x3_damped_flat(Hpp_f.astype(jnp.float32),
                                  lam).astype(dt)
    from bundleadjustment_jl_tpu.ops import pallas_schur as _ps
    P = Hpp_f.size // 9
    # ~10 lane-padded (P, 128) buffers are live at once in the direct
    # form (9 adjugate columns + the stacked result), so the budget is
    # per-buffer: GATHER_DIRECT_MAX_BYTES / 10.
    if P * 128 * jnp.dtype(dt).itemsize > _ps.GATHER_DIRECT_MAX_BYTES // 10:
        chunk = min(_ps.GATHER_CHUNK, P)
        nchunks = P // chunk
        nfull = nchunks * chunk

        def step(i, out):
            blk = jax.lax.dynamic_slice(
                Hpp_f, (i * (chunk * 9),), (chunk * 9,))
            return jax.lax.dynamic_update_slice(
                out, _inv3x3_damped_flat_direct(blk, lam),
                (i * (chunk * 9),))

        out = jax.lax.fori_loop(
            0, nchunks, step, jnp.zeros((P * 9,), dt))
        if P > nfull:
            out = jax.lax.dynamic_update_slice(
                out, _inv3x3_damped_flat_direct(Hpp_f[nfull * 9:], lam),
                (nfull * 9,))
        return out
    return _inv3x3_damped_flat_direct(Hpp_f, lam)


def _inv3x3_damped_flat_direct(Hpp_f: jnp.ndarray, lam) -> jnp.ndarray:
    dt = Hpp_f.dtype
    M = Hpp_f.reshape(-1, 9)
    lam = jnp.asarray(lam, dt)
    a, b, c = M[:, 0] + lam, M[:, 1], M[:, 2]
    d, e, f = M[:, 3], M[:, 4] + lam, M[:, 5]
    g, h, i = M[:, 6], M[:, 7], M[:, 8] + lam
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    ok = jnp.isfinite(det) & (det > jnp.finfo(dt).tiny * 8.0)
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    z = jnp.zeros_like(a)
    da = 1.0 / jnp.maximum(jnp.where(jnp.isfinite(a), a, 0.0),
                           jnp.finfo(dt).tiny * 8.0)
    de = 1.0 / jnp.maximum(jnp.where(jnp.isfinite(e), e, 0.0),
                           jnp.finfo(dt).tiny * 8.0)
    di = 1.0 / jnp.maximum(jnp.where(jnp.isfinite(i), i, 0.0),
                           jnp.finfo(dt).tiny * 8.0)
    cols = [jnp.where(ok, adj * inv_det, fb) for adj, fb in
            zip((A, B, C, D, E, F, G, H, I),
                (da, z, z, z, de, z, z, z, di))]
    return jnp.stack(cols, axis=-1).reshape(-1)


def damp(H: jnp.ndarray, lam) -> jnp.ndarray:
    """Add ``lambda I`` to a batch of square blocks (Levenberg damping)."""
    n = H.shape[-1]
    return H + lam * jnp.eye(n, dtype=H.dtype)
