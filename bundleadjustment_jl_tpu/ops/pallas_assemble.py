"""Fully-fused Gauss-Newton assembly: ONE streaming pass per linearization.

The kminor assembly path previously ran four HBM passes per accepted LM
iteration: linearize (read 64 B/row packed operands, write 256 B/row JR +
128 B/row W), then two reduce kernels re-reading JR (128 + 64 B/row).
This kernel fuses all of it: it streams only the STATIC per-row problem
data (one (8, n) pack of pt2d/weight/ids — 32 B/row, built once per
solve), gathers camera params from an in-VMEM table and point coords from
a per-tile haloed window, runs the full analytic linearization chain
(`ops.pallas_linearize.linearize_chain`) in registers, writes the k-minor
``W`` out (128 B/row — the only large output; the stacked JR array never
exists), and reduces [Hpp | g_p] per point tile and [Hcc | g_c] into a
persistent camera-scatter accumulator, plus the objective. ~160 B/row of
HBM traffic per linearization vs ~640 B/row for the split pipeline.

Camera-scatter companion of `ops/pallas_schur.py` (same tile/bounds
machinery, same gates: point-sorted rows, ncams small enough for the
in-VMEM tables).  Correctness subtleties:

- Chunk windows are C-aligned, so boundary chunks are written by TWO
  adjacent tiles.  The per-tile point window carries a C-point halo on
  BOTH sides, so every row of every chunk a tile touches finds its point
  in VMEM — both writers produce identical W values and the double write
  is benign (grid steps are sequential).
- Point-reduce rows outside the tile's point range drop out of the local
  one-hot automatically; the camera scatter and the objective mask to
  the exact [start, end) row range so each row contributes exactly once.
- Padding rows carry w = 0 through the chain -> exact zeros everywhere.

Reference role: this pass is the whole of `jac_coord!`'s 2x12 block
chain (`/root/reference/src/BALNLPModels.jl:161-206`,
`JacobianByHand.jl:27-101`) PLUS the J'J/J'r assembly the reference
delegates to sparse matrix machinery (`lm.jl:61-81`, `lma_aux.jl:191-212`)
— executed at streaming speed in one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bundleadjustment_jl_tpu.ops.pallas_linearize import (
    linearize_chain, project_chain)
from bundleadjustment_jl_tpu.ops.pallas_schur import (
    FAC_DP, FAC_PNT_L, INTERPRET, K_PAD, SEG_TILE, _chunk_rows, _doth,
    _dotp, _fac_gather, _fac_scatter, _fac_scatter_L, _iota01, _parts,
    fac_cam_L, fac_rows, fac_table, fac_unscramble)
import bundleadjustment_jl_tpu.ops.pallas_schur as pallas_schur

# lo-digit width of the hi-layout point window (point coords stored
# (width/L, L*3), a pure reshape of the flat coords; window row offsets
# stay 8-aligned because halo offsets are 128-multiples and 128/L*? —
# L=16 gives H/L row windows at 8-multiple offsets).
FAC_H_L = 16


def pack_pw(problem) -> jnp.ndarray:
    """(8, n_pad) static per-problem stream: rows 0-1 pt2d, 2 weight,
    3 pnt_id, 4 cam_id (f32-exact: ids < 2^24), 5-7 zero.  Loop-invariant
    inside the jitted solve — XLA hoists the build out of the LM loop."""
    n = problem.nobs_pad
    z = jnp.zeros((1, n), jnp.float32)
    return jnp.concatenate([
        problem.pt2d.T.astype(jnp.float32),
        problem.w.reshape(1, n).astype(jnp.float32),
        problem.pnt_idx.reshape(1, n).astype(jnp.float32),
        problem.cam_idx.reshape(1, n).astype(jnp.float32),
        z, z, z], axis=0)


def _assemble_kernel(bounds_ref, pw_ref, pts_ref, cams_ref,
                     w_out, outp_ref, outc_ref, obj_ref,
                     pw_s, pts_s, wbuf, acc_p, sems, wsems, psem, *,
                     C, P, H, fac=None):
    """One point tile.  H = points-window size (P + 2C, C-halo).

    Refs: bounds (ntiles+1,) SMEM; pw (8, n) ANY; pts (8, width) ANY
    (k-minor points, width >= ntiles*P + 2C); cams (ncams, 9) VMEM;
    w_out (K_PAD, n) ANY output (manual chunk DMA); outp (P, 12) blocked
    per tile; outc (ncams, 90) persistent; obj (1, 1) persistent.
    Scratch: pw_s (2, 8, C); pts_s (8, H); wbuf (2, K_PAD, C);
    acc_p (P, 12) f32; sems (2,) read DMA; wsems (2,) write DMA;
    psem () points DMA.
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P
    lo0 = (start // C) * C
    nchunks = pl.cdiv(end - lo0, jnp.int32(C))
    ncams = outc_ref.shape[0]
    if fac:
        width_rows = pts_ref.shape[0]
    else:
        width = pts_ref.shape[1]

    @pl.when(t == 0)
    def _():
        outc_ref[:] = jnp.zeros_like(outc_ref)
        obj_ref[:] = jnp.zeros_like(obj_ref)

    acc_p[:] = jnp.zeros_like(acc_p)

    # Haloed point window (C points each side, clamped into the padded
    # array; `halo_lo` is used for both the DMA and local indexing, so
    # clamping never desynchronizes them).  Offsets stay 128-aligned:
    # t*P - C is a multiple of 128, and the clamp bounds are 0 / width-H
    # (width is a multiple of 128 by construction).  Mosaic's divisibility
    # proof can't see through the clip — assert it with pl.multiple_of
    # (interpret mode has no such constraint, so CPU tests don't need it,
    # but the hardware compile fails without it).
    if fac:
        Lc, Lca, Lh, Lp = fac
        width = width_rows * Lh          # point capacity of the window
        halo_lo = pl.multiple_of(jnp.clip(seg_base - C, 0, width - H),
                                 128)
        row0 = pl.multiple_of(halo_lo // Lh, 8)
        pts_copy = pltpu.make_async_copy(
            pts_ref.at[pl.ds(row0, H // Lh), :], pts_s, psem)
    else:
        halo_lo = pl.multiple_of(jnp.clip(seg_base - C, 0, width - H),
                                 128)
        pts_copy = pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(halo_lo, H)], pts_s, psem)
    pts_copy.start()

    def rd(j, s):
        return pltpu.make_async_copy(
            pw_ref.at[:, pl.ds(lo0 + j * C, C)], pw_s.at[s], sems.at[s])

    @pl.when(nchunks > 0)
    def _():
        rd(0, 0).start()

    pts_copy.wait()
    pts = pts_s[:].astype(jnp.float32)       # (8, H) | (H/Lh, Lh*3)
    if fac:
        LW = pts.shape[1]                # Lh*3 lane-padded to 128
        pts_parts = _parts(pts, "gather")
        cam_parts = _parts(cams_ref[:].astype(jnp.float32), "gather")
        # fold masked (LW, C) window rows to (3, C) coords (padded
        # lanes carry zero coords; their lo never matches anyway)
        fold3 = _iota01((3, LW), lambda r: r, lambda c: c % 3)

    def body(j, _):
        s = jax.lax.rem(jnp.asarray(j, jnp.int32), jnp.int32(2))

        @pl.when(j + 1 < nchunks)
        def _():
            rd(j + 1, jax.lax.rem(jnp.asarray(j + 1, jnp.int32),
                                  jnp.int32(2))).start()

        rd(j, s).wait()
        x = pw_s[s].astype(jnp.float32)                      # (8, C)
        obs = [x[0:1], x[1:2]]
        w = x[2:3]
        pid = x[3:4].astype(jnp.int32)
        cid = x[4:5].astype(jnp.int32)

        if fac:
            # camera params from the hi-layout table; point coords from
            # the hi-layout window: one hi dot + lane-mask + 0/1 fold.
            cpar = _fac_gather(cid, cam_parts, Lc, FAC_DP)   # (16, C)
            hi_rel = pid // Lh - row0
            lo_p = pid - (pid // Lh) * Lh
            nwin = H // Lh
            oh_h = (jax.lax.broadcasted_iota(jnp.int32, (nwin, C), 0)
                    == hi_rel).astype(jnp.float32)
            tmp = _dotp(pts_parts, oh_h, ((0,), (0,)),
                        "lhs")                               # (LW, C)
            lo_div = jax.lax.broadcasted_iota(
                jnp.int32, (LW, C), 0) // 3
            masked = jnp.where(lo_div == lo_p, tmp, 0.0)
            X3 = _doth(fold3, masked, ((1,), (0,)), "rhs",
                       "expand")                             # (3, C)
        else:
            # camera params (9, C) from the VMEM table
            oh_v = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                    == cid).astype(jnp.float32)
            cpar = _doth(cams_ref[:], oh_v, ((0,), (0,)),
                         "lhs", "gather")                    # (9, C)
            # point coords (3, C) from the haloed window
            lh = pid - halo_lo
            oh_h = (jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
                    == lh).astype(jnp.float32)
            X3 = _doth(pts, oh_h, ((1,), (0,)),
                       "lhs", "gather")                      # (8, C)

        Jc, Jp, res = linearize_chain(
            [cpar[a:a + 1] for a in range(3)],
            [cpar[a:a + 1] for a in range(3, 6)],
            cpar[6:7], cpar[7:8], cpar[8:9],
            [X3[b:b + 1] for b in range(3)], obs, w)

        # W chunk out (row 3a+b), double-buffered write DMA.
        zero = jnp.zeros_like(w)
        w_rows = [Jc[a] * Jp[0][b] + Jc[9 + a] * Jp[1][b]
                  for a in range(9) for b in range(3)] + [zero] * 5
        wr = pltpu.make_async_copy(
            wbuf.at[s], w_out.at[:, pl.ds(lo0 + j * C, C)], wsems.at[s])

        @pl.when(j >= 2)
        def _():
            wr.wait()                     # slot free (write j-2 done)

        wbuf[s] = jnp.concatenate(w_rows, axis=0).astype(wbuf.dtype)
        wr.start()

        # exact-range mask for the cross-tile-unique reductions
        rowid = (lo0 + j * C
                 + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1))
        vm = ((rowid >= start) & (rowid < end))

        # [Hpp | g_p] (12, C): local one-hot drops out-of-tile rows.
        rows12 = [Jp[0][b] * Jp[0][e] + Jp[1][b] * Jp[1][e]
                  for b in range(3) for e in range(3)]
        rows12 += [Jp[0][b] * res[0] + Jp[1][b] * res[1] for b in range(3)]
        local = pid - seg_base
        if fac:
            acc_p[:] += _fac_scatter(local, jnp.concatenate(rows12, 0),
                                     "scatter", P, Lp, 12)
        else:
            oh_p = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
                    == local).astype(jnp.float32)
            acc_p[:] += _doth(
                oh_p, jnp.concatenate(rows12, axis=0),
                ((1,), (1,)), "rhs", "scatter")              # (P, 12)

        # [Hcc | g_c] (90, C) -> persistent camera scatter (masked ids).
        rows90 = [Jc[a] * Jc[d] + Jc[9 + a] * Jc[9 + d]
                  for a in range(9) for d in range(9)]
        rows90 += [Jc[a] * res[0] + Jc[9 + a] * res[1] for a in range(9)]
        camm = jnp.where(vm, cid, -1)
        if fac:
            outc_ref[:] += _fac_scatter(camm, jnp.concatenate(rows90, 0),
                                        "scatter", ncams * Lca, Lca, 90)
        else:
            oh_c = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                    == camm).astype(jnp.float32)
            outc_ref[:] += _doth(
                oh_c, jnp.concatenate(rows90, axis=0),
                ((1,), (1,)), "rhs", "scatter")              # (ncams, 90)

        # objective (weighted residuals; masked to this tile's rows)
        vmf = vm.astype(jnp.float32)
        obj_ref[:] += 0.5 * jnp.sum(vmf * (res[0] * res[0]
                                           + res[1] * res[1]))
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    # drain the last (up to 2) W writes before the next tile reuses wbuf
    def drain(s):
        j = nchunks - 1 - s
        pltpu.make_async_copy(
            wbuf.at[jax.lax.rem(j, jnp.int32(2))],
            w_out.at[:, pl.ds(lo0 + j * C, C)],
            wsems.at[jax.lax.rem(j, jnp.int32(2))]).wait()

    @pl.when(nchunks > 0)
    def _():
        drain(0)

    @pl.when(nchunks > 1)
    def _():
        drain(1)

    if fac:
        # hi-layout point accumulator -> the (P, 12) tile output
        nhip = P // Lp
        ohPT = _iota01((P, nhip), lambda r: r // Lp, lambda c: c)
        D2 = _dotp(ohPT, _parts(acc_p[:], "gather"), ((1,), (0,)), "rhs")
        mask = _iota01((P, Lp * 12), lambda r: r % Lp, lambda c: c // 12)
        F = _iota01((Lp * 12, 12), lambda r: r % 12, lambda c: c)
        outp_ref[:] = _doth(D2 * mask, F, ((1,), (0,)), "lhs", "expand")
    else:
        outp_ref[:] = acc_p[:]


def assemble_scatter(pw, pts16, cams, bounds, ncams, npnts, *,
                     out_dtype=jnp.float32, interpret=None):
    """Fused linearize + assemble -> (W_t (K_PAD, n) ``out_dtype``,
    outp (ntiles*P, 12) f32, outc (ncams, 90) f32, obj (1, 1) f32).

    ``pw``: :func:`pack_pw` stream; ``pts16``: k-minor (8, width) point
    coords, width a multiple of 128 and >= ntiles*P + 2C (use
    :func:`pad_points`); ``cams``: (ncams, 9) table; ``bounds``:
    `tile_bounds(pnt_starts, npnts)`.
    """
    if interpret is None:
        interpret = pallas_schur.INTERPRET
    n_pad = pw.shape[1]
    C = _chunk_rows(n_pad)
    P = SEG_TILE
    H = P + 2 * C
    ntiles = bounds.shape[0] - 1
    fac = None
    ncams_t = cams.shape[0]
    if pallas_schur.FACTOR:
        Lc, Lh, Lp = fac_cam_L(ncams_t), FAC_H_L, 8
        Lca = max(_fac_scatter_L(ncams_t, 90), 2)
        fac = (Lc, Lca, Lh, Lp)
        assert pts16.shape[0] * Lh >= ntiles * P + 2 * C, (
            f"points rows {pts16.shape[0]} * {Lh} < {ntiles * P + 2 * C}")
        cams = fac_table(cams, Lc)
        nhic = -(-ncams_t // Lca)
        outc_shape = (nhic, Lca * 90)
        pts_scratch = pltpu.VMEM((H // Lh, pts16.shape[1]), pts16.dtype)
        accp_shape = (P // Lp, Lp * 12)
    else:
        assert pts16.shape[1] >= ntiles * P + 2 * C, (
            f"points width {pts16.shape[1]} < {ntiles * P + 2 * C}")
        outc_shape = (ncams_t, 90)
        pts_scratch = pltpu.VMEM((8, H), pts16.dtype)
        accp_shape = (P, 12)

    kern = functools.partial(_assemble_kernel, C=C, P=P, H=H, fac=fac)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[any_spec, any_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[any_spec,
                   pl.BlockSpec((P, 12), lambda t, b: (t, 0)),
                   pl.BlockSpec(outc_shape, lambda t, b: (0, 0)),
                   pl.BlockSpec((1, 1), lambda t, b: (0, 0))],
        scratch_shapes=[
            pltpu.VMEM((2, 8, C), jnp.float32),
            pts_scratch,
            pltpu.VMEM((2, K_PAD, C), out_dtype),
            pltpu.VMEM(accp_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # Raise Mosaic's 16 MB scoped-vmem cap at large camera counts: the
    # (ncams, 90) accumulator + (ncams, C) scatter one-hots measured
    # 48.27 MB at ncams=13682 (logs/r4/abtest_r4.log group C; v5e has
    # 128 MB VMEM/core). The factorized layout shrinks both ~Lca-fold;
    # keep the raised cap regardless.
    params = None
    if ncams_t * (C + 180) * 4 > 12 * 2**20:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    W_t, outp, outc, obj = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((K_PAD, n_pad), out_dtype),
                   jax.ShapeDtypeStruct((ntiles * P, 12), jnp.float32),
                   jax.ShapeDtypeStruct(outc_shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(bounds, pw, pts16, cams)
    if fac:
        outc = fac_unscramble(outc, ncams_t, 90, fac[1])
    return W_t, outp, outc, obj


def _obj_fac_kernel(pofs_ref, pw_ref, pts_ref, cams_ref, out_ref, pts_s,
                    psem, *, C, S, WLOC, Lc, Lh, nhic8):
    """Factorized :func:`_obj_kernel`: hi-layout trial-point windows
    (one narrow hi dot + lane-masked fold per scale) and factorized
    camera-table gathers; the (WLOC, C) window one-hot and its
    (ncams, C) camera sibling are gone.  ``pts``: (S*WR, LW) stacked
    hi-layout trial points (WR = width/Lh rows per scale); ``cams``:
    (S*nhic8, Lc*FAC_DP) stacked hi-layout tables."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    WR = pts_ref.shape[0] // S
    H2r = WLOC // Lh
    pofs = pl.multiple_of(pofs_ref[j], 128)
    row0 = pl.multiple_of(pofs // Lh, 8)
    cps = []
    for s in range(S):
        cp = pltpu.make_async_copy(
            pts_ref.at[pl.ds(s * WR + row0, H2r), :],
            pts_s.at[pl.ds(s * H2r, H2r), :], psem.at[s])
        cp.start()
        cps.append(cp)

    x = pw_ref[:].astype(jnp.float32)
    obs = [x[0:1], x[1:2]]
    w = x[2:3]
    pid = x[3:4].astype(jnp.int32)
    cid = x[4:5].astype(jnp.int32)
    hi_rel = pid // Lh - row0
    lo_p = pid - (pid // Lh) * Lh
    oh_h = (jax.lax.broadcasted_iota(jnp.int32, (H2r, C), 0)
            == hi_rel).astype(jnp.float32)
    LW = pts_ref.shape[1]
    lo_div = jax.lax.broadcasted_iota(jnp.int32, (LW, C), 0) // 3
    fold3 = _iota01((3, LW), lambda r: r, lambda c: c % 3)
    for cp in cps:
        cp.wait()
    pts = pts_s[:].astype(jnp.float32)           # (S*H2r, LW)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc = jnp.zeros((1, 128), jnp.float32)
    cams = cams_ref[:].astype(jnp.float32)
    for s in range(S):
        cam_parts = _parts(cams[s * nhic8:(s + 1) * nhic8], "gather")
        cpar = _fac_gather(cid, cam_parts, Lc, FAC_DP)       # (16, C)
        win_parts = _parts(pts[s * H2r:(s + 1) * H2r], "gather")
        tmp = _dotp(win_parts, oh_h, ((0,), (0,)), "lhs")    # (LW, C)
        masked = jnp.where(lo_div == lo_p, tmp, 0.0)
        X3 = _doth(fold3, masked, ((1,), (0,)), "rhs",
                   "expand")                                 # (3, C)
        res = project_chain(
            [cpar[a:a + 1] for a in range(3)],
            [cpar[a:a + 1] for a in range(3, 6)],
            cpar[6:7], cpar[7:8], cpar[8:9],
            [X3[b:b + 1] for b in range(3)], obs, w)
        val = 0.5 * jnp.sum(res[0] * res[0] + res[1] * res[1])
        acc = acc + jnp.where(col == s, val, 0.0)
    out_ref[:] += acc


def _obj_kernel(pofs_ref, pw_ref, pts_ref, cams_ref, out_ref, pts_s,
                psem, *, C, S, WLOC):
    """One C-row column block: trial objectives for S scale candidates.

    ``pofs``: per-block 128-aligned point-window offsets (scalar
    prefetch); ``pw``: blocked (8, C) static pack; ``pts``: (S*8, width)
    stacked k-minor trial points (rows 8 s + d), windowed by manual DMA;
    ``cams``: (S, ncams, 9) trial camera tables in VMEM;
    out (1, 128): objective per scale in columns 0..S-1 (accumulated
    across the sequential grid).  Flat column blocks partition the rows
    exactly, so no masking is needed (padding rows carry w = 0)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # pofs values are built 128-aligned (`trial_point_offsets`), but a
    # scalar-prefetch value is opaque to Mosaic's divisibility proof —
    # assert the alignment for the dynamic DMA slice.
    pofs = pl.multiple_of(pofs_ref[j], 128)
    cp = pltpu.make_async_copy(
        pts_ref.at[:, pl.ds(pofs, WLOC)], pts_s, psem)
    cp.start()

    x = pw_ref[:].astype(jnp.float32)
    obs = [x[0:1], x[1:2]]
    w = x[2:3]
    pid = x[3:4].astype(jnp.int32)
    cid = x[4:5].astype(jnp.int32)
    ncams = cams_ref.shape[1]
    oh_v = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
            == cid).astype(jnp.float32)
    lh = pid - pofs
    oh_h = (jax.lax.broadcasted_iota(jnp.int32, (WLOC, C), 0)
            == lh).astype(jnp.float32)
    cp.wait()
    pts = pts_s[:].astype(jnp.float32)                       # (S*8, WLOC)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc = jnp.zeros((1, 128), jnp.float32)
    for s in range(S):
        cpar = _doth(cams_ref[s], oh_v, ((0,), (0,)),
                     "lhs", "gather")                        # (9, C)
        X3 = _doth(pts[8 * s:8 * s + 3], oh_h, ((1,), (0,)),
                   "lhs", "gather")                          # (3, C)
        res = project_chain(
            [cpar[a:a + 1] for a in range(3)],
            [cpar[a:a + 1] for a in range(3, 6)],
            cpar[6:7], cpar[7:8], cpar[8:9],
            [X3[b:b + 1] for b in range(3)], obs, w)
        val = 0.5 * jnp.sum(res[0] * res[0] + res[1] * res[1])
        acc = acc + jnp.where(col == s, val, 0.0)
    out_ref[:] += acc


def objective_scatter(pw, pts_all, cams_all, pofs, *, interpret=None):
    """Fused trial objectives -> (S,) f32: ONE pass over the 32 B/row
    static pack evaluates the forward projection residual for every
    linesearch scale (vs S vmapped gather+project passes in XLA).

    ``pts_all``: (S*8, width) stacked k-minor trial points; ``cams_all``:
    (S, ncams, 9) trial cameras; ``pofs``: (nblocks,) int32 aligned
    point-window offsets (<= width - WLOC)."""
    if interpret is None:
        interpret = pallas_schur.INTERPRET
    n_pad = pw.shape[1]
    C = _chunk_rows(n_pad)
    S = cams_all.shape[0]
    WLOC = C + 256
    nblocks = n_pad // C

    if pallas_schur.FACTOR:
        ncams_t = cams_all.shape[1]
        Lc, Lh = fac_cam_L(ncams_t), FAC_H_L
        nhic = -(-ncams_t // Lc)
        nhic8 = -(-nhic // 8) * 8      # 8-aligned per-scale row blocks
        tabs = jnp.concatenate([
            jnp.pad(fac_table(cams_all[s], Lc),
                    ((0, nhic8 - nhic), (0, 0)))
            for s in range(S)], axis=0)
        kern = functools.partial(_obj_fac_kernel, C=C, S=S, WLOC=WLOC,
                                 Lc=Lc, Lh=Lh, nhic8=nhic8)
        scratch = [pltpu.VMEM((S * (WLOC // Lh), pts_all.shape[1]),
                              pts_all.dtype),
                   pltpu.SemaphoreType.DMA((S,))]
        cams_arg = tabs
    else:
        kern = functools.partial(_obj_kernel, C=C, S=S, WLOC=WLOC)
        scratch = [pltpu.VMEM((8 * S, WLOC), pts_all.dtype),
                   pltpu.SemaphoreType.DMA]
        cams_arg = cams_all
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((8, C), lambda j, p: (0, j)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda j, p: (0, 0)),
        scratch_shapes=scratch,
        )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
    )(pofs, pw, pts_all, cams_arg)
    return out[0, :S]


def trial_point_offsets(pnt_idx, nobs_pad: int, width: int,
                        C: int | None = None) -> jnp.ndarray:
    """(nblocks,) 128-aligned per-block point-window offsets for
    :func:`objective_scatter` (rows are point-sorted, so block j's
    points start at ``pnt_idx[j C]``)."""
    C = C or _chunk_rows(nobs_pad)
    WLOC = C + 256
    p0 = pnt_idx[::C].astype(jnp.int32)
    return jnp.clip((p0 // 128) * 128, 0, width - WLOC)


def stack_trial_points(points, dp, scales, width: int) -> jnp.ndarray:
    """(npnts, 3) + per-scale steps -> the trial-objective kernel's
    stacked point array: (S*8, width) k-minor (rows 8 s + d), or with
    the factorized kernels the stacked hi-layout
    (S * width/FAC_H_L, FAC_H_L*3 -> 128 lanes), per-scale row
    blocks — a pure reshape of each scale's flat coords."""
    S = scales.shape[0]
    trial = (points[None] + scales[:, None, None] * dp[None])   # (S,n,3)
    if pallas_schur.FACTOR:
        flat = trial.astype(jnp.float32).reshape(S, -1)
        flat = jnp.pad(flat, ((0, 0), (0, width * 3 - flat.shape[1])))
        arr = flat.reshape(S * (width // FAC_H_L), FAC_H_L * 3)
        lw = -(-arr.shape[1] // 128) * 128
        return jnp.pad(arr, ((0, 0), (0, lw - arr.shape[1])))
    kt = jnp.swapaxes(trial, 1, 2).astype(jnp.float32)          # (S,3,n)
    kt = jnp.pad(kt, ((0, 0), (0, 5), (0, width - kt.shape[2])))
    return kt.reshape(S * 8, width)


def pad_points(points, ntiles: int, C: int | None = None) -> jnp.ndarray:
    """(npnts, 3) -> the assembly kernel's point-window array, zero-padded
    for the halo windows (width = ntiles*P + 2C rounded up to a multiple
    of 128 points): k-minor (8, width), or with the factorized kernels
    the hi-layout (width/FAC_H_L, FAC_H_L*3) — a pure reshape of the
    flat coords, no transpose."""
    from bundleadjustment_jl_tpu.ops.pallas_schur import (
        CHUNK_ROWS, pad_rows)
    P = SEG_TILE
    C = C or CHUNK_ROWS
    width = ntiles * P + 2 * C
    width = ((width + 127) // 128) * 128
    if pallas_schur.FACTOR:
        arr = fac_rows(points.astype(jnp.float32).reshape(-1),
                       width // FAC_H_L, FAC_H_L, 3)
        # manual-DMA window slices need a 128-multiple lane extent
        lw = -(-arr.shape[1] // 128) * 128
        return jnp.pad(arr, ((0, 0), (0, lw - arr.shape[1])))
    pts = pad_rows(points.T.astype(jnp.float32), 8)
    return jnp.pad(pts, ((0, 0), (0, width - pts.shape[1])))
