"""Fused Pallas TPU kernels for the Schur-complement inner loop.

The XLA formulation of ``S @ v`` (`ops/schur.py:schur_matvec`) executes
~15 separate HBM-roundtripping ops per matvec: two row gathers, two
27-wide block products (each an elementwise multiply + constant matmul),
two segment reductions (scatter-add), and the point/camera diagonal
applies.  Measured end-to-end (docs/performance.md, scripts/tpu_abtest.py)
the loop runs far below HBM speed-of-light: the bytes are dominated by
per-observation intermediates and every op is a separate pass.

This module collapses each *direction* of the matvec into ONE Pallas
kernel pass that streams the ``W`` blocks exactly once:

``_seg_block_reduce`` — the shared kernel.  Observations are sorted by
segment (points: the native `BAProblem.from_arrays` layout; cameras: the
``cam_perm`` permutation) so each output segment owns a contiguous row
range.  The grid runs over *segment tiles* (P segments); each grid step
walks its row range in fixed-size, **C-aligned** chunks with manual
HBM→VMEM DMA, computes the per-row 9x3 block product in VMEM, and
reduces rows to segments with a local one-hot matmul on the MXU (exact:
0/1 one-hot side in one bf16 term, value side in three — see ``SPLIT3``).
The accumulator lives in VMEM; only the final per-tile output is written
back.

TPU layout contract (learned from Mosaic's DMA-slice rules, which this
file encodes): a manual HBM→VMEM copy may only slice shapes/offsets that
are multiples of the (8, 128) f32 tiling.  Therefore every streamed
per-row array is **k-minor with tile-padded rows**:

- ``W`` travels as (32, n_pad): the 27 block entries (row c = 3a+b)
  zero-padded to 32 sublanes; chunks slice the lane dim at offsets that
  are multiples of the chunk size C (a multiple of 128 dividing n_pad).
- per-row operands as (8, n_pad) (3-vectors) / (16, n_pad) (9-vectors),
  zero-padded — :func:`pad_rows`;
- segment ids as (1, n_pad) (lane-tiled, sliceable).

The zero padding is what makes masks unnecessary: padded W rows/operand
rows contribute exact zeros, and rows of the shared aligned window whose
segment falls outside the tile's range [t*P, (t+1)*P) match no row of
the local one-hot — no validity masks, no clamped re-reads, no double
counting (BAL padding rows carry W = 0 from their zero weights).

Instantiations (wired behind ``PALLAS_MODE`` in `ops/schur.py`):

- point direction (:func:`wtv_point_reduce`): rows in native point-sorted
  order; gathers ``v[cam_idx]`` *in-kernel* via a camera one-hot against
  the full (ncams, 9) table kept in VMEM (cameras are few; the table is
  KBs), computes ``W' v`` per row and reduces per point.  Output either
  (npnts, 3), optionally folding ``sign * Hpp_inv @ (. + add)`` in-kernel
  (serves `back_substitute`), or k-minor (8, npnts) (``out_k8=True``) so
  the matvec's intermediate feeds the camera pass with a single lane
  gather — no transposes between the two kernels.
- camera direction (:func:`wt_cam_reduce`): rows in camera-sorted order,
  per-row 9x3-block times 3-vector, reduced per camera.  The matvec
  streams ``Y = W Hpp_inv`` here (built once per `reduce_system`), which
  absorbs the point-diagonal solve into the camera pass:
  ``S v = Hcc_l v - segsum_cam(Y_k t_raw[pnt_k])``.
- camera-scatter alternative (:func:`cam_scatter_reduce`, opt-in via
  ``BA_CAM_SCATTER=1``): the camera-direction reductions stream the
  POINT-sorted arrays instead, scatter-accumulating into a persistent
  (ncams, d_out) VMEM buffer across the sequential grid — the
  camera-sorted W/JR copies and the per-matvec (8, n) operand gather
  disappear entirely (see the section comment below).

Reference role: the sweep this replaces is the reference's per-iteration
LDL^T factorization/solve (`/root/reference/src/ldl_aux.jl:122-201`);
the TPU-native speed-of-light version is this fused streaming pass.

Mosaic notes: all small constant matrices (the d→32 expansions, 32→d
group-sum reducers, 3↔9 fold maps, 8-row output padder) are built *in
kernel* from 2-D iota comparisons — no array constants, no transposes,
no lane-crossing reshapes; contractions against lane-major data use
`dot_general` dimension numbers instead of explicit transposes.  The
only dynamic machinery is a `fori_loop` with a traced trip count and
`make_async_copy` at C-aligned lane offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Global switch, mirrored into the solver's jit cache key the same way as
# ops.gatherfree.MODE / ops.segsum.SORTED_MODE.  Opt-in: the fused kernels
# assume single-device (replicated/local) arrays — under a multi-device
# NamedSharding the XLA path remains the one that partitions automatically.
PALLAS_MODE = False

# CPU test hook: run kernels through the Pallas interpreter (exact same
# code path, no Mosaic compile).
INTERPRET = False

# Rows per DMA chunk and segments per grid tile. C is the streaming unit
# (C columns of the k-minor W per DMA = C*32 floats); P bounds the one-hot
# (P, C) local reduction and the VMEM accumulator.  C must divide n_pad
# (the dispatcher halves it down to 128 until it does).  Env-overridable
# for A/B sweeps (scripts/tpu_profile.py); the defaults are the sweep
# winners on the v5e-class chip this round measured.
import os as _os
CHUNK_ROWS = int(_os.environ.get("BA_PALLAS_CHUNK", 512))
SEG_TILE = int(_os.environ.get("BA_PALLAS_SEGTILE", 512))

# Smaller segment tile for the WIDE camera-direction product kernels
# (d_out = 81/90): the one-hot local reduction costs P * d_out MXU
# mul-adds per streamed row, so a wide output wants a narrow tile.
# Cameras have many rows each (nobs/ncams >> CHUNK_ROWS at BAL scale),
# so the extra tiles add negligible boundary re-reads.
SEG_TILE_WIDE = int(_os.environ.get("BA_PALLAS_SEGTILE_WIDE", 128))

# Sublane-padded row count of the k-minor W (27 → 32: f32 tiling is 8).
K_PAD = 32

# In-kernel camera one-hot gather costs O(ncams*C) MXU FLOPs per chunk;
# past this camera count an XLA pre-gather of v (64 B/row of padded
# 9-vector traffic) is cheaper than the one-hot contraction.  With the
# SPLIT3 bf16 one-hots the crossover moved past Venice: at ncams=1778
# the fused single-stream matvec measures 72.9 ms vs ~107 ms for the
# two-pass + per-matvec XLA pre-gather (logs/mv_sweep_r3_venice.log,
# logs/profile_r3a_venice1778.log), so Venice-class problems now ride
# the fused path.  Env-overridable for sweeps.
GATHER_TABLE_MAX_CAMS = int(_os.environ.get("BA_GATHER_MAX", 2048))

# Camera-scatter mode (`cam_scatter_reduce`): camera-direction reductions
# stream the POINT-sorted arrays and scatter-accumulate into a persistent
# (ncams, d_out) VMEM accumulator across the sequential grid — no
# camera-sorted W/JR copies, no (8, n) operand pre-gather.  With the
# digit-factorized scatter (round 5) the per-chunk cost is
# O(ncams/L * C * L*d_out) MXU FLOPs and the cap covers Final-13682:
# measured there, the factorized d9 scatter reduce (214 ms/matvec)
# beats the camera-sorted route (43 ms segsum + 382 ms per-matvec
# operand gather + per-accept re-linearization of the cam-sorted W,
# logs/abtest_r5.log groups A/B) and the fused single-stream matvec
# (512 ms, group D).  Enable with BA_CAM_SCATTER=1.
CAM_SCATTER = _os.environ.get("BA_CAM_SCATTER", "0") == "1"
CAM_SCATTER_MAX_CAMS = int(_os.environ.get("BA_CAM_SCATTER_MAX", 16384))

_HIGH = jax.lax.Precision.HIGHEST

# Exact-split one-hot contractions: every MXU op in these kernels has a
# 0/1 iota-comparison matrix on one side (gather/scatter/expand/reduce)
# and f32 VALUES on the other. Precision.HIGHEST pays the full 6-pass
# f32 x f32 emulation although the 0/1 side is exactly representable in
# ONE bf16 term; splitting only the value side into 3 bf16 terms
# (hi + mid + lo covers all 24 significand bits; each residual is an
# exact f32 subtraction by Sterbenz) gives the same result in 3 native
# bf16 passes.  Whether 3 ops beat 1 six-pass op is SHAPE-dependent
# (small expansions are op-latency-bound), so sites are tagged by class
# and the enabled set is a measured choice (logs/mv_sweep_r3_*.log):
#   gather  — one-hot gathers against a VMEM value table (ncams-wide K)
#   scatter — segment/camera one-hot contractions of per-row values
#   expand  — small 0/1 expansions & per-tile folds (K_PAD/9/3-wide)
#   prod    — the per-row product functions' row picks (values split
#             ONCE per chunk and reused across all picks)
# BA_SPLIT3_CLASSES overrides (comma list or "" = all HIGHEST).
# Measured winner (logs/mv_sweep_r3_classes.log, Dubrovnik-356 shapes,
# cam-scatter mode): gather+scatter+prod — matvec 11.9 -> 7.7 ms,
# jtj_cam 6.4 -> 3.8, jtj_pnt 7.6 -> 4.7; "expand" is neutral-to-noise
# (op-latency-bound small shapes) and stays off.
SPLIT3_CLASSES = frozenset(
    c for c in _os.environ.get("BA_SPLIT3_CLASSES",
                               "gather,scatter,prod").split(",") if c)


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _f16_decode(u):
    """u16 bit patterns of f16 values -> f32, by integer bit surgery in
    VMEM.  Mosaic has no f16 dialect type ("Unsupported type in mosaic
    dialect: 'f16'", round-4 bench), so f16-stored arrays enter the
    kernels as uint16 (an XLA bitcast at the dispatcher — byte traffic
    of a 2-byte W preserved) and widen here.  Normals re-bias the
    exponent (15 -> 127) with a 13-bit mantissa shift; subnormals are
    exact as ``m * 2^-24`` (integer->float convert); inf/nan cannot
    occur in the stored W (range-equilibrated to max ~2^14 by
    `_maybe_cast_facto`, the `normalize_F16!` heir)."""
    h = u.astype(jnp.int32)
    exp = (h >> 10) & 0x1f
    mant = h & 0x3ff
    normal = jax.lax.bitcast_convert_type(
        ((h & 0x7fff) << 13) + ((127 - 15) << 23), jnp.float32)
    val = jnp.where(exp == 0, mant.astype(jnp.float32) * (2.0 ** -24),
                    normal)
    return jnp.where((h & 0x8000) != 0, -val, val)


def _wf32(x):
    """Widen a streamed storage-dtype chunk to f32 (u16 = f16 bits)."""
    if x.dtype == jnp.uint16:
        return _f16_decode(x)
    return x.astype(jnp.float32)


def _w_bits(W_t):
    """Dispatcher-side storage wrap: f16 W streams enter the kernels as
    uint16 bit patterns (see :func:`_f16_decode`)."""
    if W_t is not None and W_t.dtype == jnp.float16:
        return jax.lax.bitcast_convert_type(W_t, jnp.uint16)
    return W_t


def _parts(x, cls, exact=False):
    """Pre-split a value tensor for reuse across several 0/1 dots of one
    chunk; a 1-tuple f32 keeps the HIGHEST path when the class is off.
    ``exact=True`` (value already exactly representable in bf16 — e.g.
    bf16-stored W upconverted or raw): ONE bf16 term, one native pass."""
    if exact:
        return (x.astype(jnp.bfloat16),)
    if x.dtype == jnp.uint16:
        x = _f16_decode(x)
    elif x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    return _split3(x) if cls in SPLIT3_CLASSES else (x,)


def _dotp(a, b, dims, split):
    """Dot where one side is 0/1 (exactly bf16) and the other is a
    pre-split tuple from :func:`_parts` (``split`` names the tuple side).
    1-tuple -> single HIGHEST dot; 3-tuple -> 3 native bf16 passes."""
    parts = a if split == "lhs" else b
    if len(parts) == 1 and parts[0].dtype == jnp.float32:
        pair = (parts[0], b) if split == "lhs" else (a, parts[0])
        return _dot(*pair, dims)
    out = None
    if split == "lhs":
        bb = b.astype(jnp.bfloat16)
        for part in parts:
            t = jax.lax.dot_general(part, bb, (dims, ((), ())),
                                    preferred_element_type=jnp.float32)
            out = t if out is None else out + t
        return out
    ab = a.astype(jnp.bfloat16)
    for part in parts:
        t = jax.lax.dot_general(ab, part, (dims, ((), ())),
                                preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _doth(a, b, dims, split, cls="scatter"):
    """One-shot form of :func:`_dotp`: split the value side here."""
    val = a if split == "lhs" else b
    parts = _parts(val.astype(jnp.float32), cls)
    return _dotp(parts if split == "lhs" else a,
                 parts if split != "lhs" else b, dims, split)


def set_mode(on: bool) -> None:
    global PALLAS_MODE
    PALLAS_MODE = bool(on)


# ---------------------------------------------------------------------------
# Digit-factorized one-hot contractions (round 5).
#
# A flat one-hot scatter  out[s] += rows[r of segment s]  costs
# ceil(nseg/128) * ceil(C/128) MXU passes with only d (=3/9) useful output
# lanes out of 128 — at ncams=13682 that is 428 passes per chunk, the
# measured 2.84 s/op camera reduce of abtest group D.  Splitting the id as
# s = hi*L + lo turns it into (1) a VPU lane-masked expansion of the (d, C)
# values to (L*d, C) — lane block lo holds the rows whose id has that low
# digit — and (2) ONE narrow MXU dot against the (nhi, C) hi one-hot,
# nhi = ceil(nseg/L).  The lane dim now carries L segments' worth of
# output, so the pass count drops by ~min(L, 128/d) and the one-hot
# build/VMEM shrink by L.  The table gather factorizes the same way in
# reverse: one hi dot gathers the L-camera GROUP row per observation, a
# lane-masked select picks the lo member.  Layout contract: hi-layout
# arrays are (nhi, L*dq) with lane e = lo*dq + dd, so
# `x.reshape(nhi*L, dq)` is the plain row form (pure XLA reshape, no
# transpose).  Gather tables pad dq to FAC_DP so the in-kernel lo-select
# slices at 8-aligned sublane offsets.
# ---------------------------------------------------------------------------
FACTOR = _os.environ.get("BA_FACTOR", "1") == "1"
FAC_CAM_L = int(_os.environ.get("BA_FAC_CAM_L", 0))   # 0 = auto by ncams
FAC_PNT_L = int(_os.environ.get("BA_FAC_PNT_L", 8))   # divides SEG_TILE
FAC_DP = 16


def fac_cam_L(ncams: int) -> int:
    """lo-digit width for camera-indexed one-hots: balances the hi
    one-hot build (ncams/L * C compares) against the lo-select
    (L * FAC_DP * C lane ops); ~sqrt(ncams/FAC_DP), clamped to powers
    of two in [8, 64]."""
    if FAC_CAM_L:
        return FAC_CAM_L
    L = 8
    while L < 64 and L * L * FAC_DP < ncams:
        L *= 2
    return L


def fac_table(v: jnp.ndarray, L: int, dp: int = FAC_DP) -> jnp.ndarray:
    """(nseg, d) value table -> (nhi, L*dp) hi-layout (rows d..dp zero)."""
    nseg, d = v.shape
    nhi = -(-nseg // L)
    vp = jnp.pad(v, ((0, nhi * L - nseg), (0, dp - d)))
    return vp.reshape(nhi, L * dp)


def fac_rows(flat: jnp.ndarray, nhi: int, L: int, d: int) -> jnp.ndarray:
    """Flat per-segment (nseg*d,) values -> (nhi, L*d) hi-layout blocks
    (zero-padded to nhi*L rows); pure reshape, no transpose."""
    pad = nhi * L * d - flat.shape[0]
    if pad > 0:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(nhi, L * d)


def fac_unscramble(out: jnp.ndarray, nseg: int, d: int, L: int):
    """(nhi, L*dq) hi-layout sums -> (nseg, d) plain rows."""
    nhi, Ldq = out.shape
    return out.reshape(nhi * L, Ldq // L)[:nseg, :d]


def _fac_scatter(ids, val, cls, nseg, L, d, dq=None, parts=None):
    """In-kernel factorized scatter-reduce term: per-row values ``val``
    (d, C) summed into hi-layout (nhi, L*dq) by ``ids`` (1, C); ids
    outside [0, nseg) are dropped exactly (their hi or lo digit matches
    nothing).  ``parts``: optional pre-split value tuple."""
    dq = dq or d
    C = ids.shape[1]
    nhi = -(-nseg // L)
    hi = ids // L
    lo = ids - hi * L
    oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (nhi, C), 0)
             == hi).astype(jnp.float32)
    lo_div = jax.lax.broadcasted_iota(jnp.int32, (L * dq, C), 0) // dq
    if parts is None:
        parts = _parts(val.astype(jnp.float32), cls)
    bparts = []
    for p in parts:
        if dq != d:
            p = jnp.pad(p, ((0, dq - d), (0, 0)))
        B = pltpu.repeat(p, L, 0)                        # (L*dq, C)
        bparts.append(jnp.where(lo_div == lo, B, jnp.zeros_like(B)))
    return _dotp(oh_hi, tuple(bparts), ((1,), (1,)), "rhs")


def _fac_gather(ids, parts, L, dp, nseg_hint=0):
    """In-kernel factorized table gather: hi-layout table parts
    (nhi, L*dp) -> (dp, C) per-row values ``table[ids]`` (rows beyond
    the table's true d are zero).  One hi dot + L aligned lo-selects."""
    del nseg_hint
    C = ids.shape[1]
    nhi = parts[0].shape[0]
    hi = ids // L
    lo = ids - hi * L
    oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (nhi, C), 0)
             == hi).astype(jnp.float32)
    tmp = _dotp(parts, oh_hi, ((0,), (0,)), "lhs")       # (L*dp, C)
    out = None
    for lo_i in range(L):
        piece = jnp.where(lo == lo_i, tmp[lo_i * dp:(lo_i + 1) * dp, :],
                          0.0)
        out = piece if out is None else out + piece
    return out


def _iota01(shape, row_fn, col_fn):
    """0/1 f32 matrix from a comparison of two iota-derived index maps."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (row_fn(r) == col_fn(c)).astype(jnp.float32)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), precision=_HIGH,
                               preferred_element_type=jnp.float32)


# Double-buffered chunk streaming: every scratch stream buffer has a
# leading slot axis of 2; chunk j lands in slot j%2 and the copy for
# chunk j+1 is issued BEFORE waiting on / computing chunk j, so the next
# DMA overlaps the current chunk's VMEM compute (measured ~1.6x on the
# matvec kernels vs the serial start/wait/compute loop).
def _dma_start(copies, j, slot, sems):
    """copies: [(mk_src(j) -> HBM slice ref, dst (2, ...) VMEM ref)]."""
    for k, (mk_src, dst) in enumerate(copies):
        pltpu.make_async_copy(mk_src(j), dst.at[slot],
                              sems.at[slot, k]).start()


def _dma_wait(copies, j, slot, sems):
    for k, (mk_src, dst) in enumerate(copies):
        pltpu.make_async_copy(mk_src(j), dst.at[slot],
                              sems.at[slot, k]).wait()


def _seg_reduce_kernel(bounds_ref, idx_ref, wt_ref, xt_ref, cam_ref,
                       table_ref, diag_ref, add_ref, out_ref,
                       wt_s, xc_s, idx_s, acc, sems, *,
                       C, P, d_x, d_out, gather_table, fold_diag,
                       has_add, out_k8, sign):
    """One segment tile: stream rows [align_C(bounds[t]), bounds[t+1]).

    Refs (presence controlled by the static flags):
      bounds_ref  (ntiles+1,)   SMEM scalar-prefetch row bounds per tile
      idx_ref     (1, n_pad)    ANY  segment id per row (sorted)
      wt_ref      (K_PAD,n_pad) ANY  W blocks k-minor, row c = 3a+b
      xt_ref      (dxp, n_pad)  ANY  padded per-row operand [not gather]
      cam_ref     (1, n_pad)    ANY  camera id per row      [gather_table]
      table_ref   (ncams, 9)    VMEM full camera table      [gather_table]
      diag_ref    (P, 9)        VMEM 3x3 blocks to fold        [fold_diag]
      add_ref     (P, 3)        VMEM additive pre-fold term      [has_add]
      out_ref     (P, d_out) | (8, P) [out_k8]   VMEM output tile
    Scratch (leading axis 2 = double-buffer slots): wt_s (2,K_PAD,C),
      xc_s (2,1,C) ids | (2,dxp,C) values, idx_s (2,1,C),
      acc ((P,d_out) | (d_out,P)) f32, sems DMA (2,3).
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P
    lo0 = (start // C) * C                     # C-aligned window start
    nchunks = pl.cdiv(end - lo0, jnp.int32(C))

    acc[:] = jnp.zeros_like(acc)

    # In-kernel 0/1 constants (W row c = 3a + b; x indexed by a or b).
    # Padded W rows (>= 27) and padded operand rows are zero, so the
    # expansions need no explicit masks.
    dxe = 9 if gather_table else xc_s.shape[1]   # [1]: axis 0 = DMA slot
    exp_m = (_iota01((K_PAD, dxe), lambda r: r // 3, lambda c: c)
             if d_x == 9
             else _iota01((K_PAD, dxe), lambda r: r % 3, lambda c: c))
    red_m = (_iota01((d_out, K_PAD), lambda r: r, lambda c: c // 3)
             if d_out == 9
             else _iota01((d_out, K_PAD), lambda r: r, lambda c: c % 3))

    src = cam_ref if gather_table else xt_ref
    copies = [
        (lambda j: wt_ref.at[:, pl.ds(lo0 + j * C, C)], wt_s),
        (lambda j: idx_ref.at[:, pl.ds(lo0 + j * C, C)], idx_s),
        (lambda j: src.at[:, pl.ds(lo0 + j * C, C)], xc_s),
    ]

    @pl.when(nchunks > 0)
    def _():
        _dma_start(copies, 0, 0, sems)

    def body(j, _):
        slot = jax.lax.rem(j, jnp.int32(2))

        @pl.when(j + 1 < nchunks)
        def _():
            _dma_start(copies, j + 1, jax.lax.rem(j + 1, jnp.int32(2)), sems)

        _dma_wait(copies, j, slot, sems)
        wt_c = wt_s[slot]
        xc_c = xc_s[slot]
        idx_c = idx_s[slot]

        if gather_table:
            # x columns = table[cam_id]': contract a (ncams, C) one-hot
            # with the table over dim 0 — no transposes.
            ncams = table_ref.shape[0]
            oh_t = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                    == xc_c).astype(jnp.float32)               # (ncams, C)
            x_t = _doth(table_ref[:], oh_t, ((0,), (0,)),
                        "lhs", "gather")                       # (9, C)
        else:
            x_t = xc_c.astype(jnp.float32)                     # (dxp, C)

        x_rep = _doth(exp_m, x_t, ((1,), (0,)), "rhs",
                      "expand")                                # (K_PAD, C)
        prod = _wf32(wt_c) * x_rep                # (K_PAD, C)
        rows_t = _doth(red_m, prod, ((1,), (0,)), "rhs",
                       "expand")                               # (d_out, C)

        # Local one-hot segment reduction: rows whose segment falls
        # outside [seg_base, seg_base+P) (neighbors in the shared aligned
        # window) match no one-hot row and drop out exactly.
        local = idx_c - seg_base                               # (1, C)
        oh_seg = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
                  == local).astype(jnp.float32)                # (P, C)
        if out_k8 and not fold_diag:
            acc[:] += _doth(rows_t, oh_seg, ((1,), (1,)),
                            "lhs")                             # (d_out, P)
        else:
            acc[:] += _doth(oh_seg, rows_t, ((1,), (1,)),
                            "rhs")                             # (P, d_out)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    res = acc[:]
    if fold_diag:
        if has_add:
            res = res + add_ref[:].astype(jnp.float32)
        # out[p, a] = sum_b diag[p, 3a+b] * res[p, b]
        rep = _doth(res, _iota01((3, 9), lambda r: r, lambda c: c % 3),
                    ((1,), (0,)), "lhs", "expand")             # (P, 9)
        res = _doth(diag_ref[:].astype(jnp.float32) * rep,
                    _iota01((9, 3), lambda r: r // 3, lambda c: c),
                    ((1,), (0,)), "lhs", "expand")             # (P, 3)
    elif has_add:
        # post-reduce additive term (no diagonal fold) — serves
        # back_substitute's  -(Hpp_inv g_p + segsum(W' dc))  form.
        res = res + add_ref[:].astype(jnp.float32)
    res = sign * res
    if out_k8:
        if fold_diag:
            # (P, 3) -> zero-padded (8, P): contract the tile axis.
            res = _doth(_iota01((8, res.shape[1]), lambda r: r,
                                lambda c: c), res, ((1,), (1,)), "rhs",
                        "expand")
        else:
            # (d_out, P) -> zero-padded (8, P) via a 0/1 row placer.
            res = _doth(_iota01((8, res.shape[0]), lambda r: r,
                                lambda c: c), res, ((1,), (0,)), "rhs",
                        "expand")
    out_ref[:] = res.astype(out_ref.dtype)


def _seg_reduce_fac_kernel(bounds_ref, idx_ref, wt_ref, xt_ref, cam_ref,
                           table_ref, diag_ref, add_ref, out_ref,
                           wt_s, xc_s, idx_s, acc_h, sems, *,
                           C, P, d_x, d_out, Lc, Lp, fold_diag,
                           has_add, out_k8, sign):
    """Digit-factorized `_seg_reduce_kernel`: same refs/variants, but the
    per-chunk segment reduction accumulates in hi-layout (nhi, Lp*dq)
    (see :func:`_fac_scatter`), the optional camera-table gather is
    factorized (``Lc`` > 0 -> ``table_ref`` is (nhic, Lc*FAC_DP)), the
    Hpp fold runs IN hi-layout via 0/1 group-map dots, and a per-tile
    epilogue converts back to the legacy output layout — callers see
    identical shapes."""
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P
    lo0 = (start // C) * C
    nchunks = pl.cdiv(end - lo0, jnp.int32(C))
    nhip = P // Lp
    dq = 8 if d_out == 3 else d_out

    acc_h[:] = jnp.zeros_like(acc_h)

    gather_table = Lc > 0
    dxe = FAC_DP if gather_table else xc_s.shape[1]
    exp_m = (_iota01((K_PAD, dxe), lambda r: r // 3, lambda c: c)
             if d_x == 9
             else _iota01((K_PAD, dxe), lambda r: r % 3, lambda c: c))
    red_m = (_iota01((d_out, K_PAD), lambda r: r, lambda c: c // 3)
             if d_out == 9
             else _iota01((d_out, K_PAD), lambda r: r, lambda c: c % 3))
    tab_parts = (_parts(table_ref[:].astype(jnp.float32), "gather")
                 if gather_table else None)

    src = cam_ref if gather_table else xt_ref
    copies = [
        (lambda j: wt_ref.at[:, pl.ds(lo0 + j * C, C)], wt_s),
        (lambda j: idx_ref.at[:, pl.ds(lo0 + j * C, C)], idx_s),
        (lambda j: src.at[:, pl.ds(lo0 + j * C, C)], xc_s),
    ]

    @pl.when(nchunks > 0)
    def _():
        _dma_start(copies, 0, 0, sems)

    def body(j, _):
        slot = jax.lax.rem(j, jnp.int32(2))

        @pl.when(j + 1 < nchunks)
        def _():
            _dma_start(copies, j + 1, jax.lax.rem(j + 1, jnp.int32(2)), sems)

        _dma_wait(copies, j, slot, sems)
        wt_c = wt_s[slot]
        if gather_table:
            x_t = _fac_gather(xc_s[slot], tab_parts, Lc, FAC_DP)
        else:
            x_t = xc_s[slot].astype(jnp.float32)
        x_rep = _doth(exp_m, x_t, ((1,), (0,)), "rhs", "expand")
        prod = _wf32(wt_c) * x_rep                # (K_PAD, C)
        rows_t = _doth(red_m, prod, ((1,), (0,)), "rhs",
                       "expand")                               # (d_out, C)
        local = idx_s[slot] - seg_base
        acc_h[:] += _fac_scatter(local, rows_t, "scatter", P, Lp, d_out,
                                 dq=dq)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    # Epilogue in hi-layout.  Key encoding lo*5 + min(component, 3)
    # marks (point-lo, vector-component); padded dq lanes never match.
    def key8(r):
        return (r // 8) * 5 + jnp.minimum(r % 8, 3)

    res_h = acc_h[:]
    if has_add:
        G3_8 = _iota01((Lp * 3, Lp * 8),
                       lambda r: (r // 3) * 5 + r % 3, key8)
        res_h = res_h + _doth(add_ref[:].astype(jnp.float32), G3_8,
                              ((1,), (0,)), "lhs", "expand")
    if fold_diag:
        R8_9 = _iota01((Lp * 8, Lp * 9), key8,
                       lambda c: (c // 9) * 5 + (c % 9) % 3)
        rep9 = _doth(res_h, R8_9, ((1,), (0,)), "lhs", "expand")
        prodh = diag_ref[:].astype(jnp.float32) * rep9
        T9_8 = _iota01((Lp * 9, Lp * 8),
                       lambda r: (r // 9) * 5 + (r % 9) // 3, key8)
        res_h = _doth(prodh, T9_8, ((1,), (0,)), "lhs", "expand")
    res_h = sign * res_h

    if out_k8:
        # hi-layout -> (8, P) k-minor: one hi dot + Lp aligned selects.
        ohT = _iota01((nhip, P), lambda r: r, lambda c: c // Lp)
        D1 = _dotp(_parts(res_h, "gather"), ohT, ((0,), (0,)),
                   "lhs")                                      # (Lp*8, P)
        loP = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) % Lp
        dp3 = None
        for lo_i in range(Lp):
            piece = jnp.where(loP == lo_i,
                              D1[lo_i * 8:(lo_i + 1) * 8, :], 0.0)
            dp3 = piece if dp3 is None else dp3 + piece
        out_ref[:] = dp3.astype(out_ref.dtype)
    else:
        # hi-layout -> (P, d_out): dot rows out by hi, lane-mask the
        # matching lo block, fold lane groups with a 0/1 dq -> d_out map.
        ohPT = _iota01((P, nhip), lambda r: r // Lp, lambda c: c)
        D2 = _dotp(ohPT, _parts(res_h, "gather"), ((1,), (0,)),
                   "rhs")                                      # (P, Lp*dq)
        mask = _iota01((P, Lp * dq), lambda r: r % Lp, lambda c: c // dq)
        F = _iota01((Lp * dq, d_out), lambda r: r % dq, lambda c: c)
        out_ref[:] = _doth(D2 * mask, F, ((1,), (0,)), "lhs",
                           "expand").astype(out_ref.dtype)


def _chunk_rows(n_pad: int) -> int:
    C = min(CHUNK_ROWS, n_pad)
    while C > 128 and n_pad % C:
        C //= 2
    if n_pad % C:
        raise ValueError(f"n_pad={n_pad} not a multiple of 128")
    return C


def _seg_block_reduce(W_t, idx_row, bounds, nseg, *, d_x, d_out,
                      xt_obs=None, cam_row=None, table=None,
                      diag=None, add=None, sign=1.0, out_k8=False,
                      out_dtype=None, interpret=False):
    """Dispatch the fused kernel.  ``W_t`` is k-minor (K_PAD, n_pad).
    Exactly one of ``xt_obs`` (k-minor row-padded (8|16, n_pad) operand)
    or ``cam_row``+``table`` (in-kernel gather) is given.
    """
    W_t = _w_bits(W_t)
    n_pad = W_t.shape[1]
    C = _chunk_rows(n_pad)
    P = SEG_TILE
    gather_table = table is not None
    fold_diag = diag is not None
    has_add = add is not None
    out_dtype = out_dtype or (table.dtype if gather_table else xt_obs.dtype)
    ntiles = bounds.shape[0] - 1

    fac = FACTOR
    if fac and (fold_diag or has_add or out_k8):
        assert d_out == 3, (d_out, fold_diag, has_add, out_k8)
    Lp = FAC_PNT_L
    nhip = P // Lp
    dq = 8 if d_out == 3 else d_out
    if fac:
        Lc = fac_cam_L(table.shape[0]) if gather_table else 0
        kern = functools.partial(
            _seg_reduce_fac_kernel, C=C, P=P, d_x=d_x, d_out=d_out,
            Lc=Lc, Lp=Lp, fold_diag=fold_diag, has_add=has_add,
            out_k8=out_k8, sign=sign)
    else:
        kern = functools.partial(
            _seg_reduce_kernel, C=C, P=P, d_x=d_x, d_out=d_out,
            gather_table=gather_table, fold_diag=fold_diag,
            has_add=has_add, out_k8=out_k8, sign=sign)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec, any_spec]               # idx_row, W_t
    args = [idx_row.reshape(1, n_pad).astype(jnp.int32), W_t]
    if gather_table:
        in_specs += [any_spec, pl.BlockSpec(memory_space=pltpu.VMEM)]
        args += [cam_row.reshape(1, n_pad).astype(jnp.int32),
                 fac_table(table, Lc) if fac else table]
    else:
        in_specs += [any_spec]
        args += [xt_obs]
    if fold_diag:
        if fac:
            in_specs.append(pl.BlockSpec((nhip, Lp * 9),
                                         lambda t, b: (t, 0)))
            args.append(fac_rows(diag.reshape(-1), ntiles * nhip, Lp, 9))
        else:
            in_specs.append(pl.BlockSpec((P, 9), lambda t, b: (t, 0)))
            args.append(diag.reshape(nseg, 9))
    if has_add:
        if fac:
            in_specs.append(pl.BlockSpec((nhip, Lp * 3),
                                         lambda t, b: (t, 0)))
            args.append(fac_rows(add.reshape(-1), ntiles * nhip, Lp, 3))
        else:
            in_specs.append(pl.BlockSpec((P, 3), lambda t, b: (t, 0)))
            args.append(add.reshape(nseg, 3))

    def kernel(bounds_ref, *refs):
        it = iter(refs)
        idx_ref, wt_ref = next(it), next(it)
        if gather_table:
            cam_ref, table_ref, xt_ref = next(it), next(it), None
        else:
            xt_ref, cam_ref, table_ref = next(it), None, None
        diag_ref = next(it) if fold_diag else None
        add_ref = next(it) if has_add else None
        out_ref = next(it)
        wt_s, xc_s, idx_s, acc, sems = it
        kern(bounds_ref, idx_ref, wt_ref, xt_ref, cam_ref, table_ref,
             diag_ref, add_ref, out_ref, wt_s, xc_s, idx_s, acc, sems)

    xc_shape = (1, C) if gather_table else (xt_obs.shape[0], C)
    xc_dtype = jnp.int32 if gather_table else xt_obs.dtype
    if out_k8:
        out_spec = pl.BlockSpec((8, P), lambda t, b: (0, t))
        out_shape = jax.ShapeDtypeStruct((8, nseg), out_dtype)
        acc_shape = (P, d_out) if fold_diag else (d_out, P)
    else:
        out_spec = pl.BlockSpec((P, d_out), lambda t, b: (t, 0))
        out_shape = jax.ShapeDtypeStruct((nseg, d_out), out_dtype)
        acc_shape = (P, d_out)
    if fac:
        acc_shape = (nhip, Lp * dq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, K_PAD, C), W_t.dtype),
            pltpu.VMEM((2,) + xc_shape, xc_dtype),
            pltpu.VMEM((2, 1, C), jnp.int32),
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bounds, *args)


def tile_bounds(starts: jnp.ndarray, nseg: int,
                P: int | None = None) -> jnp.ndarray:
    """Row bounds per segment tile: bounds[t] = starts[min(t*P, nseg)]."""
    P = P or SEG_TILE
    ntiles = -(-nseg // P)
    idx = jnp.minimum(jnp.arange(ntiles + 1) * P, nseg)
    return starts[idx].astype(jnp.int32)


def to_k_minor(W_f: jnp.ndarray) -> jnp.ndarray:
    """Flat (n_pad*27,) row-major W blocks → k-minor (K_PAD, n_pad),
    entries 27..31 zero (Mosaic DMA slices need 8-multiple sublanes).

    The transpose input materializes (n, 27) tile-padded 27 -> 128; at
    Final-13682 that is a 7.4 GB bf16 temp, so large n transposes in
    GATHER_CHUNK-row chunks (same threshold discipline as
    :func:`gather_k_minor`)."""
    n = W_f.size // 27
    itemsize = jnp.dtype(W_f.dtype).itemsize
    if n * 128 * itemsize <= GATHER_DIRECT_MAX_BYTES:
        Wt = W_f.reshape(-1, 27).T
        return jnp.pad(Wt, ((0, K_PAD - 27), (0, 0)))
    chunk = min(GATHER_CHUNK, n)
    nchunks = n // chunk
    nfull = nchunks * chunk

    # The accumulator stays strictly FLAT (K_PAD * n,): a 2-D (K_PAD, n)
    # fori carry gets assigned a column-major layout by XLA (physical
    # (n, 32) padded 32 -> 128 = 7.44 GB zeros buffer, measured,
    # logs/probe_final_compile11.log). Row-contiguous 1-D writes keep
    # every buffer packed; the final reshape is a bitcast.
    def step(i, out):
        w = jax.lax.dynamic_slice(W_f, (i * (chunk * 27),), (chunk * 27,))
        # Barrier between the flat slice and the (chunk, 27) view: the
        # algebraic simplifier otherwise commutes slice-of-flat into
        # slice-of-reshape and hoists ONE whole (n, 27) reshape out of
        # the loop — which layout-assigns T(8,128) (27 lanes pad to 128)
        # = 7.44 GB at Final-13682, the measured _lm_run HBM OOM
        # (logs/r4/final_capacity_r4.log allocation #1).
        w = jax.lax.optimization_barrier(w)
        wt = w.reshape(chunk, 27).T
        for k in range(27):
            out = jax.lax.dynamic_update_slice(
                out, wt[k], (k * n + i * chunk,))
        return out

    out = jax.lax.fori_loop(
        0, nchunks, step, jnp.zeros((K_PAD * n,), W_f.dtype))
    if n > nfull:
        # Same barrier as in `step`: keep the tail reshape on the slice.
        wt = jax.lax.optimization_barrier(
            W_f[nfull * 27:]).reshape(-1, 27).T
        for k in range(27):
            out = jax.lax.dynamic_update_slice(
                out, wt[k], (k * n + nfull,))
    return out.reshape(K_PAD, n)


def pad_rows(x_t: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Zero-pad a k-minor (d, n) operand to ``rows`` sublanes."""
    return jnp.pad(x_t, ((0, rows - x_t.shape[0]), (0, 0)))


# XLA lowers a k-minor column gather `t[:, idx]` as a ROW gather plus a
# relayout copy, and the row-major (n, d) intermediate tile-pads d -> 128:
# measured 14.9 GB for f32[31.2M, 9] at Final-13682
# (logs/probe_final_compile2.log) vs a harmless 2.5 GB at Venice-5M.
# Above GATHER_DIRECT_MAX_BYTES of padded temp the gather is chunked
# through a lax.scan (GATHER_CHUNK rows per step, bounding the temp to
# ~128 MB) — the threshold deliberately leaves every Venice/Dubrovnik
# shape on the direct form so their compiled programs are unchanged.
GATHER_CHUNK = int(_os.environ.get("BA_GATHER_CHUNK", 1 << 18))
GATHER_DIRECT_MAX_BYTES = int(
    _os.environ.get("BA_GATHER_DIRECT_MAX", 4 << 30))


def gather_k_minor(t16: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``t16[:, idx]`` — k-minor (d, m) table gathered to (d, n) — with the
    row-major relayout temp bounded at large n (see GATHER_CHUNK).

    The chunked form writes straight into the (d, n) result with a
    fori_loop + dynamic_update_slice: a scan stacking (d, chunk) steps
    lets the layout assigner put d in the lane dimension of the stacked
    buffer (padded 16 -> 128, 14.75 GB at Final-13682 — measured,
    logs/probe_final_compile3.log)."""
    n = idx.shape[0]
    d, m = t16.shape
    itemsize = jnp.dtype(t16.dtype).itemsize
    if n * 128 * itemsize <= GATHER_DIRECT_MAX_BYTES:
        return t16[:, idx]
    if m * 128 * itemsize > GATHER_DIRECT_MAX_BYTES:
        # Huge TABLE too (e.g. W_t[:, cam_perm] at Final-13682): XLA
        # lowers the per-chunk column gather by transposing the table to
        # row-major — loop-invariant, so it hoists OUT of the chunk loop
        # as one (m, d) tile-padded buffer (7.44 GB measured,
        # logs/probe_final_compile8.log). Permute row-by-row with flat
        # 1-D gathers instead: no 2-D intermediate exists at any point.
        t_flat = t16.reshape(-1)

        def row(k, out):
            r = jax.lax.dynamic_slice(t_flat, (k * m,), (m,))
            return jax.lax.dynamic_update_slice(out, r[idx], (k * n,))

        out = jax.lax.fori_loop(0, d, row,
                                jnp.zeros((d * n,), t16.dtype))
        return out.reshape(d, n)
    chunk = min(GATHER_CHUNK, n)
    nchunks = n // chunk
    nfull = nchunks * chunk

    def step(i, out):
        ix = jax.lax.dynamic_slice(idx, (i * chunk,), (chunk,))
        return jax.lax.dynamic_update_slice(out, t16[:, ix], (0, i * chunk))

    out = jax.lax.fori_loop(
        0, nchunks, step, jnp.zeros((d, n), t16.dtype))
    if n > nfull:
        out = jax.lax.dynamic_update_slice(
            out, t16[:, idx[nfull:]], (0, nfull))
    return out


# ---------------------------------------------------------------------------
# Generic segment-sorted PRODUCT-reduce kernel: stream one (or two) k-minor
# arrays sorted by segment, form a static per-row product (d_out, C) built
# from 0/1 iota picks, and reduce rows to segments with the same local
# one-hot MXU reduction as `_seg_reduce_kernel`.  Powers the fused Schur
# diagonal (W Hpp_inv W', d_out=81) and the fused Gauss-Newton assembly
# reductions (Jc'Jc + Jc'r, d_out=90; Jp'Jp + Jp'r, d_out=12) — the ops
# whose XLA formulation ends in a TPU scatter-add (~100x below bandwidth,
# measured the dominant per-iteration cost in scripts/tpu_profile.py).
# ---------------------------------------------------------------------------

def _fac_scatter_L(nseg: int, d: int) -> int:
    """lo-digit width for a persistent factorized scatter accumulator:
    balances the hi one-hot build (nseg/L * C) against the value
    expansion (L * d * C); 0 disables (flat one-hot)."""
    if not FACTOR:
        return 0
    L = 1
    while L < 32 and L * L * d < nseg:
        L *= 2
    return 0 if L == 1 else L


def _prod_reduce_kernel(bounds_ref, idx_ref, x1_ref, x2_ref, out_ref,
                        x1_s, x2_s, idx_s, acc, sems, *,
                        C, P, r1, n1, prod, Lp=0):
    """One segment tile of ``out[s] += prod(x1, x2) rows of segment s``.

    ``prod(x1_f32 (n1, C), x2_f32 | None) -> (d_out, C)`` is a static
    per-row product function built from iota-comparison 0/1 picks.
    ``(r1, n1)``: sublane window of x1 streamed per chunk (8-multiples).
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P
    lo0 = (start // C) * C
    nchunks = pl.cdiv(end - lo0, jnp.int32(C))
    acc[:] = jnp.zeros_like(acc)

    copies = [
        (lambda j: x1_ref.at[pl.ds(r1, n1), pl.ds(lo0 + j * C, C)], x1_s),
        (lambda j: idx_ref.at[:, pl.ds(lo0 + j * C, C)], idx_s),
    ]
    if x2_ref is not None:
        copies.append(
            (lambda j: x2_ref.at[:, pl.ds(lo0 + j * C, C)], x2_s))

    @pl.when(nchunks > 0)
    def _():
        _dma_start(copies, 0, 0, sems)

    def body(j, _):
        slot = jax.lax.rem(j, jnp.int32(2))

        @pl.when(j + 1 < nchunks)
        def _():
            _dma_start(copies, j + 1, jax.lax.rem(j + 1, jnp.int32(2)), sems)

        _dma_wait(copies, j, slot, sems)
        x1 = x1_s[slot]                 # storage dtype: prod()/_parts()
        #                                 exploit bf16-exact W directly
        x2 = x2_s[slot].astype(jnp.float32) if x2_ref is not None else None
        rows_t = prod(x1, x2)                                  # (d_out, C)
        local = idx_s[slot] - seg_base
        if Lp:
            acc[:] += _fac_scatter(local, rows_t, "scatter", P, Lp,
                                   rows_t.shape[0])
        else:
            oh_seg = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
                      == local).astype(jnp.float32)            # (P, C)
            acc[:] += _doth(oh_seg, rows_t, ((1,), (1,)),
                            "rhs")                             # (P, d_out)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    if Lp:
        # hi-layout accumulator -> the legacy (P, d_out) tile output.
        nhip, Ld = acc.shape
        dq = Ld // Lp
        ohPT = _iota01((P, nhip), lambda r: r // Lp, lambda c: c)
        D2 = _dotp(ohPT, _parts(acc[:], "gather"), ((1,), (0,)), "rhs")
        mask = _iota01((P, Ld), lambda r: r % Lp, lambda c: c // dq)
        F = _iota01((Ld, dq), lambda r: r % dq, lambda c: c)
        out_ref[:] = _doth(D2 * mask, F, ((1,), (0,)), "lhs",
                           "expand").astype(out_ref.dtype)
    else:
        out_ref[:] = acc[:].astype(out_ref.dtype)


def seg_prod_reduce(x1_t, idx_row, bounds, nseg, *, d_out, prod,
                    x1_rows=None, x2_t=None, P=None,
                    out_dtype=jnp.float32, interpret=None):
    """Dispatch :func:`_prod_reduce_kernel` -> (nseg, d_out)."""
    if interpret is None:
        interpret = INTERPRET
    x1_t = _w_bits(x1_t)
    n_pad = x1_t.shape[1]
    C = _chunk_rows(n_pad)
    P = P or SEG_TILE
    r1, n1 = x1_rows or (0, x1_t.shape[0])
    ntiles = bounds.shape[0] - 1
    has_x2 = x2_t is not None

    # Factorized segment accumulate pays off while L*d_out fits one
    # lane tile (wide d_out = 81/90 already fills the lanes).
    Lp = 0
    if FACTOR and d_out <= 16:
        Lp = min(FAC_PNT_L, 1 << (128 // d_out).bit_length() - 1)
        Lp = Lp if P % Lp == 0 else 0
    kern = functools.partial(_prod_reduce_kernel, C=C, P=P, r1=r1, n1=n1,
                             prod=prod, Lp=Lp)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec, any_spec] + ([any_spec] if has_x2 else [])
    args = [idx_row.reshape(1, n_pad).astype(jnp.int32), x1_t] + (
        [x2_t] if has_x2 else [])

    def kernel(bounds_ref, *refs):
        it = iter(refs)
        idx_ref, x1_ref = next(it), next(it)
        x2_ref = next(it) if has_x2 else None
        out_ref = next(it)
        x1_s = next(it)
        x2_s = next(it) if has_x2 else None
        idx_s, acc, sems = it
        kern(bounds_ref, idx_ref, x1_ref, x2_ref, out_ref,
             x1_s, x2_s, idx_s, acc, sems)

    scratch = [pltpu.VMEM((2, n1, C), x1_t.dtype)]
    if has_x2:
        scratch.append(pltpu.VMEM((2, x2_t.shape[0], C), x2_t.dtype))
    acc_shape = (P // Lp, Lp * d_out) if Lp else (P, d_out)
    scratch += [pltpu.VMEM((2, 1, C), jnp.int32),
                pltpu.VMEM(acc_shape, jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((P, d_out), lambda t, b: (t, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nseg, d_out), out_dtype),
        interpret=interpret,
    )(bounds, *args)


# ---------------------------------------------------------------------------
# Camera-scatter reduce: camera-direction reductions WITHOUT camera-sorted
# copies.  Streams the point-sorted arrays (the native layout) over point
# tiles; per-row products reduce into a persistent (ncams, d_out) VMEM
# accumulator via a camera one-hot contraction.  TPU grid steps run
# sequentially on one core, so the out block (constant index map) lives in
# VMEM across all tiles and is flushed to HBM once at the end — the
# standard Pallas accumulation pattern.  Per-point operands (the Schur
# matvec's diagonally-solved t, Hpp_inv g_p, dp, packed Hpp_inv) arrive as
# (8, P) blocks pipelined per tile: with point-sorted rows, a tile's rows
# reference ONLY the tile's points, so the operand never needs an (8, n)
# per-row gather.  Boundary rows of the C-aligned window that belong to
# neighboring tiles are masked by the exact [start, end) row range (each
# row is processed by exactly one tile).
# ---------------------------------------------------------------------------

def _cam_scatter_kernel(bounds_ref, cam_ref, x1_ref, idx_ref, op_ref,
                        out_ref, x1_s, cam_s, idx_s, sems, *,
                        C, P, r1, n1, d_out, prod, has_op, Lca=0):
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P
    lo0 = (start // C) * C
    nchunks = pl.cdiv(end - lo0, jnp.int32(C))

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    copies = [
        (lambda j: x1_ref.at[pl.ds(r1, n1), pl.ds(lo0 + j * C, C)], x1_s),
        (lambda j: cam_ref.at[:, pl.ds(lo0 + j * C, C)], cam_s),
    ]
    if has_op:
        copies.append(
            (lambda j: idx_ref.at[:, pl.ds(lo0 + j * C, C)], idx_s))

    @pl.when(nchunks > 0)
    def _():
        _dma_start(copies, 0, 0, sems)

    ncams = out_ref.shape[0]

    def body(j, _):
        slot = jax.lax.rem(j, jnp.int32(2))

        @pl.when(j + 1 < nchunks)
        def _():
            _dma_start(copies, j + 1, jax.lax.rem(j + 1, jnp.int32(2)), sems)

        _dma_wait(copies, j, slot, sems)
        x1 = x1_s[slot]                 # storage dtype (see _parts)
        # Exact-range row mask (boundary rows belong to adjacent tiles).
        rowid = (lo0 + j * C
                 + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1))
        valid = (rowid >= start) & (rowid < end)
        camm = jnp.where(valid, cam_s[slot], -1)            # (1, C)
        if has_op:
            local = idx_s[slot] - seg_base                  # (1, C)
            oh_pc = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
                     == local).astype(jnp.float32)          # (P, C)
            op_ex = _doth(op_ref[:], oh_pc,
                          ((1,), (0,)), "lhs", "gather")    # (8, C)
            rows_t = prod(x1, op_ex)                        # (d_out, C)
        else:
            rows_t = prod(x1, None)
        if Lca:
            out_ref[:] += _fac_scatter(camm, rows_t, "scatter",
                                       ncams * Lca, Lca, rows_t.shape[0])
        else:
            oh_cam = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                      == camm).astype(jnp.float32)          # (ncams, C)
            out_ref[:] += _doth(oh_cam, rows_t, ((1,), (1,)),
                                "rhs")                      # (ncams, d_out)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def cam_scatter_reduce(x1_t, cam_row, bounds, ncams, *, d_out, prod,
                       idx_row=None, op_t=None, x1_rows=None, P=None,
                       interpret=None):
    """Dispatch :func:`_cam_scatter_kernel` -> (ncams, d_out) f32.

    ``x1_t``: k-minor point-sorted array (W_t or JR_t); ``cam_row``: camera
    id per row in the SAME point-sorted order (= problem.cam_idx);
    ``bounds``: point-tile row bounds (`tile_bounds(pnt_starts, npnts, P)`);
    ``op_t``: optional per-POINT (8, npnts) k-minor operand + ``idx_row``
    the point id per row.
    """
    if interpret is None:
        interpret = INTERPRET
    x1_t = _w_bits(x1_t)
    n_pad = x1_t.shape[1]
    C = _chunk_rows(n_pad)
    P = P or SEG_TILE
    r1, n1 = x1_rows or (0, x1_t.shape[0])
    ntiles = bounds.shape[0] - 1
    has_op = op_t is not None
    if has_op:
        wpad = ntiles * P - op_t.shape[1]
        if wpad > 0:
            op_t = jnp.pad(op_t, ((0, 0), (0, wpad)))

    Lca = _fac_scatter_L(ncams, d_out)
    nhic = -(-ncams // Lca) if Lca else ncams
    kern = functools.partial(_cam_scatter_kernel, C=C, P=P, r1=r1, n1=n1,
                             d_out=d_out, prod=prod, has_op=has_op,
                             Lca=Lca)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec, any_spec]
    args = [cam_row.reshape(1, n_pad).astype(jnp.int32), x1_t]
    if has_op:
        in_specs += [any_spec, pl.BlockSpec((op_t.shape[0], P),
                                            lambda t, b: (0, t))]
        args += [idx_row.reshape(1, n_pad).astype(jnp.int32), op_t]

    def kernel(bounds_ref, *refs):
        it = iter(refs)
        cam_ref, x1_ref = next(it), next(it)
        idx_ref = next(it) if has_op else None
        op_ref = next(it) if has_op else None
        out_ref = next(it)
        x1_s, cam_s, idx_s, sems = it
        kern(bounds_ref, cam_ref, x1_ref, idx_ref, op_ref, out_ref,
             x1_s, cam_s, idx_s, sems)

    out_rows, out_cols = ((nhic, Lca * d_out) if Lca
                          else (ncams, d_out))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_rows, out_cols), lambda t, b: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, n1, C), x1_t.dtype),
            pltpu.VMEM((2, 1, C), jnp.int32),
            pltpu.VMEM((2, 1, C), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    # The output block + accumulator + one-hots live in VMEM; with the
    # flat one-hot past ~8k cameras they exceed Mosaic's 16 MB default
    # scoped-vmem limit (Final-13682 d_out=9: 19.98 MB measured,
    # probe_final_compile10; d_out=90 fused assembly: 48.27 MB, round-4
    # abtest group C).  The factorized layout shrinks all three by ~Lca,
    # but keep the raised cap for the big-camera case regardless (v5e
    # has 128 MB VMEM/core).
    params = None
    if ncams * 128 * 4 * 2 > 12 * 2**20:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(bounds, *args)
    return fac_unscramble(out, ncams, d_out, Lca) if Lca else out


# Fused single-stream matvec (camera-scatter mode): VMEM cache slots for
# a tile's W chunks.  Typical BAL tiles (P=512 points x ~5 obs/pnt) span
# ~5-6 chunks at C=512; chunks beyond the cache re-stream from HBM in
# the apply loop (graceful overflow, no fallback dispatch).
MV_CACHE_CHUNKS = int(_os.environ.get("BA_MV_CACHE_CHUNKS", 8))


def _mv_scatter_kernel(bounds_ref, cam_ref, pnt_ref, wt_ref, table_ref,
                       hpp_ref, out_ref, dp_ref, w_s, pnt_s, cam_s, acc_t,
                       sems, *, C, P, sign):
    """One point tile of the FUSED ``segsum_cam(W_k (Hpp_inv
    segsum_pnt(W' v))[pnt_k])``: loop A streams the tile's rows once
    (caching chunks in VMEM), computing ``t`` for the tile's points;
    after the in-register Hpp_inv fold, loop B applies ``W t`` from the
    cache (re-streaming only overflow chunks) and scatter-accumulates
    per camera into the persistent out buffer.  W crosses HBM once per
    matvec for cached tiles — half the 2-pass traffic, no (8, npnts)
    intermediate.

    Refs: bounds (ntiles+1,) SMEM; cam/pnt ids (1, n) ANY; wt (K_PAD, n)
    ANY; table (ncams, 9) VMEM (v); hpp (16, P) VMEM block per tile
    (k-minor Hpp_inv rows 0-8 = entry 3a+b); out (ncams, 9) VMEM
    persistent.  Scratch: w_s (MV_CACHE_CHUNKS+2, K_PAD, C),
    pnt_s / cam_s (MV_CACHE_CHUNKS+2, 1, C) — SEPARATE single-sublane
    buffers: a shared (slots, 2, C) i32 scratch sliced `at[s, 0:1]`
    trips Mosaic's sublane-tiling alignment (slice extent 1 in a dim
    tiled 2) on hardware, though interpret mode accepts it —
    acc_t (3, P) f32, sems (MV_CACHE_CHUNKS+2, 3).
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P
    lo0 = (start // C) * C
    nchunks = pl.cdiv(end - lo0, jnp.int32(C))
    MAXCH = w_s.shape[0] - 2
    ncams = out_ref.shape[0]

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def slot(j):
        j = jnp.asarray(j, jnp.int32)
        return jnp.where(j < MAXCH, j, MAXCH + jax.lax.rem(j, jnp.int32(2)))

    def dma(j, s):
        pltpu.make_async_copy(wt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              w_s.at[s], sems.at[s, 0]).start()
        pltpu.make_async_copy(pnt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              pnt_s.at[s], sems.at[s, 1]).start()
        pltpu.make_async_copy(cam_ref.at[:, pl.ds(lo0 + j * C, C)],
                              cam_s.at[s], sems.at[s, 2]).start()

    def dma_wait(j, s):
        pltpu.make_async_copy(wt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              w_s.at[s], sems.at[s, 0]).wait()
        pltpu.make_async_copy(pnt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              pnt_s.at[s], sems.at[s, 1]).wait()
        pltpu.make_async_copy(cam_ref.at[:, pl.ds(lo0 + j * C, C)],
                              cam_s.at[s], sems.at[s, 2]).wait()

    acc_t[:] = jnp.zeros_like(acc_t)

    # W row 3a+b picks v component a (d_x = 9); reduce rows by b (d_out 3).
    exp9 = _iota01((K_PAD, 9), lambda r: r // 3, lambda c: c)
    red3 = _iota01((3, K_PAD), lambda r: r, lambda c: c % 3)

    @pl.when(nchunks > 0)
    def _():
        dma(0, slot(0))

    def body_a(j, _):
        s = slot(j)

        @pl.when(j + 1 < nchunks)
        def _():
            dma(j + 1, slot(j + 1))

        dma_wait(j, s)
        wt_c = _wf32(w_s[s])
        cam_c = cam_s[s]
        pnt_c = pnt_s[s]
        oh_v = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                == cam_c).astype(jnp.float32)                  # (ncams, C)
        x_t = _doth(table_ref[:], oh_v, ((0,), (0,)),
                    "lhs", "gather")                           # (9, C)
        prod = wt_c * _doth(exp9, x_t, ((1,), (0,)), "rhs",
                            "expand")                          # (K_PAD, C)
        rows3 = _doth(red3, prod, ((1,), (0,)), "rhs",
                      "expand")                                # (3, C)
        local = pnt_c - seg_base
        oh_p = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
                == local).astype(jnp.float32)                  # (P, C)
        acc_t[:] += _doth(rows3, oh_p, ((1,), (1,)), "lhs")    # (3, P)
        return 0

    jax.lax.fori_loop(0, nchunks, body_a, 0)

    # t = sign * Hpp_inv @ (t + g_p), lane-major: rep[3a+b] = t[b];
    # out3[a] = sum_b hpp[3a+b] * rep[3a+b].  hpp rows 9-11 carry g_p
    # (zero for the plain matvec) — with sign = -1 this IS the
    # back-substitution dp = -Hpp_inv (g_p + W' dc).
    t3 = acc_t[:] + hpp_ref[9:12, :].astype(jnp.float32)
    rep = _doth(_iota01((9, 3), lambda r: r % 3, lambda c: c), t3,
                ((1,), (0,)), "rhs", "expand")                 # (9, P)
    prod_h = hpp_ref[0:9, :].astype(jnp.float32) * rep
    t3 = sign * _doth(_iota01((3, 9), lambda r: r, lambda c: c // 3),
                      prod_h, ((1,), (0,)), "rhs", "expand")   # (3, P)
    # per-tile dp output (k-minor, rows 0-2; zero-padded to 8 sublanes)
    dp_ref[:] = _doth(_iota01((8, 3), lambda r: r, lambda c: c), t3,
                      ((1,), (0,)), "rhs", "expand").astype(dp_ref.dtype)

    def apply_chunk(j, wt_c, pnt_c, cam_c):
        rowid = (lo0 + j * C
                 + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1))
        valid = (rowid >= start) & (rowid < end)
        camm = jnp.where(valid, cam_c, -1)
        local = pnt_c - seg_base
        oh_p = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
                == local).astype(jnp.float32)
        op_ex = _doth(t3, oh_p, ((1,), (0,)), "lhs",
                      "gather")                                # (3, C)
        rows9 = _prod_w_op(wt_c, op_ex)                        # (9, C)
        oh_c = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                == camm).astype(jnp.float32)
        out_ref[:] += _doth(oh_c, rows9, ((1,), (1,)), "rhs")

    ncached = jnp.minimum(nchunks, jnp.int32(MAXCH))

    def body_b1(j, _):
        apply_chunk(j, w_s[j], pnt_s[j], cam_s[j])
        return 0

    jax.lax.fori_loop(0, ncached, body_b1, 0)

    @pl.when(nchunks > MAXCH)
    def _():
        dma(MAXCH, slot(MAXCH))

        def body_b2(j, _):
            s = slot(j)

            @pl.when(j + 1 < nchunks)
            def _():
                dma(j + 1, slot(j + 1))

            dma_wait(j, s)
            apply_chunk(j, w_s[s], pnt_s[s], cam_s[s])
            return 0

        jax.lax.fori_loop(MAXCH, nchunks, body_b2, 0)


def _mv_scatter_fac_kernel(bounds_ref, cam_ref, pnt_ref, wt_ref, table_ref,
                           hpp_ref, gp_ref, out_ref, dp_ref, w_s, pnt_s,
                           cam_s, acc_h, sems, *, C, P, sign, Lc, Lp):
    """Digit-factorized `_mv_scatter_kernel` (see the section comment at
    :func:`_fac_scatter`): the camera table gather, the per-point
    reduce, the point-operand gather and the camera scatter all run as
    narrow hi-digit MXU dots + lane-masked lo selections.  The per-point
    state lives in hi-layout (nhip, Lp*8) (lane e = lo*8 + b, b<3
    valid); the Hpp_inv fold happens IN that layout via three 0/1
    group-map dots (keys encode (lo, component)); the (8, P) k-minor dp
    output and the per-row operand gather convert out of it with one
    shared hi dot per tile."""
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P
    lo0 = (start // C) * C
    nchunks = pl.cdiv(end - lo0, jnp.int32(C))
    MAXCH = w_s.shape[0] - 2
    nhip = P // Lp
    ncams_pad = out_ref.shape[0] * Lc

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def slot(j):
        j = jnp.asarray(j, jnp.int32)
        return jnp.where(j < MAXCH, j, MAXCH + jax.lax.rem(j, jnp.int32(2)))

    def dma(j, s):
        pltpu.make_async_copy(wt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              w_s.at[s], sems.at[s, 0]).start()
        pltpu.make_async_copy(pnt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              pnt_s.at[s], sems.at[s, 1]).start()
        pltpu.make_async_copy(cam_ref.at[:, pl.ds(lo0 + j * C, C)],
                              cam_s.at[s], sems.at[s, 2]).start()

    def dma_wait(j, s):
        pltpu.make_async_copy(wt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              w_s.at[s], sems.at[s, 0]).wait()
        pltpu.make_async_copy(pnt_ref.at[:, pl.ds(lo0 + j * C, C)],
                              pnt_s.at[s], sems.at[s, 1]).wait()
        pltpu.make_async_copy(cam_ref.at[:, pl.ds(lo0 + j * C, C)],
                              cam_s.at[s], sems.at[s, 2]).wait()

    acc_h[:] = jnp.zeros_like(acc_h)

    # W row 3a+b picks v component a; the gathered operand arrives
    # FAC_DP-row padded, extra columns match no W row.
    exp9 = _iota01((K_PAD, FAC_DP), lambda r: r // 3, lambda c: c)
    red3 = _iota01((3, K_PAD), lambda r: r, lambda c: c % 3)
    tab_parts = _parts(table_ref[:].astype(jnp.float32), "gather")

    @pl.when(nchunks > 0)
    def _():
        dma(0, slot(0))

    def body_a(j, _):
        s = slot(j)

        @pl.when(j + 1 < nchunks)
        def _():
            dma(j + 1, slot(j + 1))

        dma_wait(j, s)
        wt_c = _wf32(w_s[s])
        x_t = _fac_gather(cam_s[s], tab_parts, Lc, FAC_DP)     # (16, C)
        prod = wt_c * _doth(exp9, x_t, ((1,), (0,)), "rhs",
                            "expand")                          # (K_PAD, C)
        rows3 = _doth(red3, prod, ((1,), (0,)), "rhs",
                      "expand")                                # (3, C)
        local = pnt_s[s] - seg_base
        acc_h[:] += _fac_scatter(local, rows3, "scatter", P, Lp, 3, dq=8)
        return 0

    jax.lax.fori_loop(0, nchunks, body_a, 0)

    # Fold  t = sign * Hpp_inv @ (t + g_p)  in hi-layout.  Key encoding
    # (lo*5 + b) marks each lane's (point-lo, vector-component); the
    # padded b>=3 lanes get key lo*5+3, which no valid lane produces.
    def key8(r):
        return (r // 8) * 5 + jnp.minimum(r % 8, 3)

    G3_8 = _iota01((Lp * 3, Lp * 8), lambda r: (r // 3) * 5 + r % 3, key8)
    gp8 = _doth(gp_ref[:].astype(jnp.float32), G3_8, ((1,), (0,)),
                "lhs", "expand")                               # (nhip, Lp*8)
    t3 = acc_h[:] + gp8
    R8_9 = _iota01((Lp * 8, Lp * 9), key8,
                   lambda c: (c // 9) * 5 + (c % 9) % 3)
    rep9 = _doth(t3, R8_9, ((1,), (0,)), "lhs", "expand")      # (nhip, Lp*9)
    prodh = hpp_ref[:].astype(jnp.float32) * rep9
    T9_8 = _iota01((Lp * 9, Lp * 8),
                   lambda r: (r // 9) * 5 + (r % 9) // 3, key8)
    t_h = sign * _doth(prodh, T9_8, ((1,), (0,)), "lhs",
                       "expand")                               # (nhip, Lp*8)
    t_parts = _parts(t_h, "gather")

    # per-tile dp output: hi-layout -> (8, P) k-minor via one hi dot
    # (shared split with loop B's operand gathers) + Lp aligned selects.
    ohT = _iota01((nhip, P), lambda r: r, lambda c: c // Lp)
    D1 = _dotp(t_parts, ohT, ((0,), (0,)), "lhs")              # (Lp*8, P)
    loP = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1) % Lp
    dp3 = None
    for lo_i in range(Lp):
        piece = jnp.where(loP == lo_i, D1[lo_i * 8:(lo_i + 1) * 8, :], 0.0)
        dp3 = piece if dp3 is None else dp3 + piece
    dp_ref[:] = dp3.astype(dp_ref.dtype)

    def apply_chunk(j, wt_c, pnt_c, cam_c):
        rowid = (lo0 + j * C
                 + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1))
        valid = (rowid >= start) & (rowid < end)
        camm = jnp.where(valid, cam_c, -1)
        local = pnt_c - seg_base
        op_ex = _fac_gather(local, t_parts, Lp, 8)             # (8, C)
        rows9 = _prod_w_op(wt_c, op_ex)                        # (9, C)
        out_ref[:] += _fac_scatter(camm, rows9, "scatter", ncams_pad,
                                   Lc, 9)

    ncached = jnp.minimum(nchunks, jnp.int32(MAXCH))

    def body_b1(j, _):
        apply_chunk(j, w_s[j], pnt_s[j], cam_s[j])
        return 0

    jax.lax.fori_loop(0, ncached, body_b1, 0)

    @pl.when(nchunks > MAXCH)
    def _():
        dma(MAXCH, slot(MAXCH))

        def body_b2(j, _):
            s = slot(j)

            @pl.when(j + 1 < nchunks)
            def _():
                dma(j + 1, slot(j + 1))

            dma_wait(j, s)
            apply_chunk(j, w_s[s], pnt_s[s], cam_s[s])
            return 0

        jax.lax.fori_loop(MAXCH, nchunks, body_b2, 0)


def _matvec_cam_scatter_fac(W_t, v, cam_row, pnt_row, hpp_inv_f, bounds,
                            ncams, npnts, *, gp_f, sign, with_dp,
                            interpret):
    W_t = _w_bits(W_t)
    n_pad = W_t.shape[1]
    C = _chunk_rows(n_pad)
    P = SEG_TILE
    ntiles = bounds.shape[0] - 1
    Lc = fac_cam_L(ncams)
    Lp = FAC_PNT_L
    assert P % Lp == 0, (P, Lp)
    nhip = P // Lp
    nhic = -(-ncams // Lc)
    nhi_tot = ntiles * nhip
    table2 = fac_table(v.astype(jnp.float32), Lc)
    hpp_h = fac_rows(hpp_inv_f.reshape(-1).astype(jnp.float32),
                     nhi_tot, Lp, 9)
    gp_h = (fac_rows(gp_f.reshape(-1).astype(jnp.float32),
                     nhi_tot, Lp, 3)
            if gp_f is not None else jnp.zeros((nhi_tot, Lp * 3),
                                               jnp.float32))

    kern = functools.partial(_mv_scatter_fac_kernel, C=C, P=P,
                             sign=float(sign), Lc=Lc, Lp=Lp)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[any_spec, any_spec, any_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((nhip, Lp * 9), lambda t, b: (t, 0)),
                  pl.BlockSpec((nhip, Lp * 3), lambda t, b: (t, 0))],
        out_specs=[pl.BlockSpec((nhic, Lc * 9), lambda t, b: (0, 0)),
                   pl.BlockSpec((8, P), lambda t, b: (0, t))],
        scratch_shapes=[
            pltpu.VMEM((MV_CACHE_CHUNKS + 2, K_PAD, C), W_t.dtype),
            pltpu.VMEM((MV_CACHE_CHUNKS + 2, 1, C), jnp.int32),
            pltpu.VMEM((MV_CACHE_CHUNKS + 2, 1, C), jnp.int32),
            pltpu.VMEM((nhip, Lp * 8), jnp.float32),
            pltpu.SemaphoreType.DMA((MV_CACHE_CHUNKS + 2, 3)),
        ],
    )
    params = None
    if nhic * (C + 128) * 4 > 12 * 2**20:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    out, dp8 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nhic, Lc * 9), jnp.float32),
                   jax.ShapeDtypeStruct((8, ntiles * P), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(bounds, cam_row.reshape(1, n_pad).astype(jnp.int32),
      pnt_row.reshape(1, n_pad).astype(jnp.int32), W_t, table2,
      hpp_h, gp_h)
    out = fac_unscramble(out, ncams, 9, Lc)
    return (out, dp8) if with_dp else out


def matvec_cam_scatter(W_t, v, cam_row, pnt_row, hpp_inv_f, bounds,
                       ncams, npnts, *, gp_f=None, sign=1.0,
                       with_dp=False, interpret=None):
    """Fused one-stream ``segsum_cam(W (sign * Hpp_inv (segsum_pnt(W' v)
    + g_p))[pnt])`` -> (ncams, 9) f32 [, dp (8, ntiles*P) k-minor].

    ``gp_f=None, sign=1``: the Schur matvec's W-coupling term.
    ``gp_f=g_p, sign=-1, with_dp=True``: back-substitution + the
    quad-form cross reduction in the same single W stream (the per-tile
    ``t`` IS ``dp``).  Requires point-sorted rows and the in-VMEM v
    table (ncams <= GATHER_TABLE_MAX_CAMS is the caller's gate)."""
    if interpret is None:
        interpret = INTERPRET
    if FACTOR:
        return _matvec_cam_scatter_fac(
            W_t, v, cam_row, pnt_row, hpp_inv_f, bounds, ncams, npnts,
            gp_f=gp_f, sign=sign, with_dp=with_dp, interpret=interpret)
    W_t = _w_bits(W_t)
    n_pad = W_t.shape[1]
    C = _chunk_rows(n_pad)
    P = SEG_TILE
    ntiles = bounds.shape[0] - 1
    # k-minor (16, width) blocked (16, P) per tile: rows 0-8 Hpp_inv,
    # rows 9-11 g_p (zero when absent).
    hpp16 = pad_rows(hpp_inv_f.reshape(npnts, 9).T, 16)
    if gp_f is not None:
        hpp16 = hpp16.at[9:12].set(
            gp_f.reshape(npnts, 3).T.astype(hpp16.dtype))
    wpad = ntiles * P - npnts
    if wpad > 0:
        hpp16 = jnp.pad(hpp16, ((0, 0), (0, wpad)))

    kern = functools.partial(_mv_scatter_kernel, C=C, P=P,
                             sign=float(sign))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def kernel(bounds_ref, cam_ref, pnt_ref, wt_ref, table_ref, hpp_ref,
               out_ref, dp_ref, w_s, pnt_s, cam_s, acc_t, sems):
        kern(bounds_ref, cam_ref, pnt_ref, wt_ref, table_ref, hpp_ref,
             out_ref, dp_ref, w_s, pnt_s, cam_s, acc_t, sems)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[any_spec, any_spec, any_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, P), lambda t, b: (0, t))],
        out_specs=[pl.BlockSpec((ncams, 9), lambda t, b: (0, 0)),
                   pl.BlockSpec((8, P), lambda t, b: (0, t))],
        scratch_shapes=[
            pltpu.VMEM((MV_CACHE_CHUNKS + 2, K_PAD, C), W_t.dtype),
            pltpu.VMEM((MV_CACHE_CHUNKS + 2, 1, C), jnp.int32),
            pltpu.VMEM((MV_CACHE_CHUNKS + 2, 1, C), jnp.int32),
            pltpu.VMEM((3, P), jnp.float32),
            pltpu.SemaphoreType.DMA((MV_CACHE_CHUNKS + 2, 3)),
        ],
    )
    # Raise Mosaic's 16 MB default scoped-vmem cap for large camera
    # counts: the (ncams, C) one-hot intermediates + (ncams, 9) out
    # block measured 20.43 MB at ncams=13682 (logs/r3e/abtest.log
    # group D; v5e has 128 MB VMEM/core).
    params = None
    if ncams * (C + 128) * 4 > 12 * 2**20:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    out, dp8 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ncams, 9), jnp.float32),
                   jax.ShapeDtypeStruct((8, ntiles * P), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(bounds, cam_row.reshape(1, n_pad).astype(jnp.int32),
      pnt_row.reshape(1, n_pad).astype(jnp.int32), W_t, v, hpp16)
    return (out, dp8) if with_dp else out


def _prod_w_op(w, op):
    """Per-row ``W_k @ op[:3]`` -> 9 rows (a) from k-minor ``w``
    (row 3a+b) and a (8, C) 3-vector operand."""
    wp = _parts(w, "prod", exact=w.dtype == jnp.bfloat16)
    out = None
    for b in range(3):
        pw = _iota01((9, w.shape[0]), lambda r, b=b: 3 * r + b,
                     lambda c: c)
        term = _dotp(pw, wp, ((1,), (0,)), "rhs") * op[b:b + 1, :]
        out = term if out is None else out + term
    return out


def _prod_wcw_rhs(w, op):
    """Combined per-row [W C W' (81); W t (9)] from k-minor ``w`` and a
    (16, C) per-point operand: rows 0-5 packed-symmetric C (= damped
    Hpp_inv), rows 6-8 ``t`` (= Hpp_inv g_p).  One W stream serves both
    the exact Schur diagonal and the reduced-RHS correction."""
    return jnp.concatenate([_prod_wcw(w, op[0:8]),
                            _prod_w_op(w, op[6:9])], axis=0)


def cam_scatter_ok(s, ncams: int) -> bool:
    """Is the camera-scatter mode applicable?  Needs the flag, point-
    sorted rows, and a moderate camera count (the one-hot contraction
    costs O(ncams * C * d_out) MXU FLOPs per chunk)."""
    return (CAM_SCATTER and ncams <= CAM_SCATTER_MAX_CAMS
            and s.pnt_starts is not None and s.pnt_perm is None)


def cam_reduce_scatter_ok(s, ncams: int, W_cam_t) -> bool:
    """Camera-direction reduce via the scatter kernel?  Either the mode
    is on (:func:`cam_scatter_ok`) or there is NO camera-sorted W copy
    to stream — the Final-scale configuration, where building W_cam_t
    materializes a tile-padded (n, 32) relayout of the whole W no matter
    how the permute is phrased (measured 7.44 GB twice:
    logs/probe_final_compile8.log, probe_final_compile9.log). The
    scatter kernel's (ncams, d_out) VMEM accumulator is ~5 MB even at
    Final-13682."""
    return ((W_cam_t is None and s.pnt_starts is not None
             and s.pnt_perm is None) or cam_scatter_ok(s, ncams))


def _sym6(b: int, c):
    """Index into the packed symmetric-3x3 storage [m00,m01,m02,m11,m12,m22]
    for entry (b, c); ``b`` a Python int, ``c`` an int array."""
    lo = jnp.minimum(b, c)
    hi = jnp.maximum(b, c)
    return lo * 3 - (lo * (lo - 1)) // 2 + (hi - lo)


def _prod_wcw(w, c6):
    """Per-row ``(W C W')`` flattened to 81 rows (r = 9a + d), from k-minor
    ``w`` (K_PAD, C; row 3a+b) and packed-symmetric ``c6`` (8, C)."""
    wp = _parts(w, "prod", exact=w.dtype == jnp.bfloat16)
    c6p = _parts(c6, "prod")
    Y = None                                   # Y[3a+c] = sum_b W[3a+b] C[b,c]
    for b in range(3):
        pw = _iota01((27, w.shape[0]), lambda r, b=b: 3 * (r // 3) + b,
                     lambda c: c)
        pc = _iota01((27, c6.shape[0]), lambda r, b=b: _sym6(b, r % 3),
                     lambda c: c)
        term = (_dotp(pw, wp, ((1,), (0,)), "rhs")
                * _dotp(pc, c6p, ((1,), (0,)), "rhs"))
        Y = term if Y is None else Y + term
    Yp = _parts(Y, "prod")
    out = None                                 # out[9a+d] = sum_c Y[3a+c] W[3d+c]
    for c in range(3):
        py = _iota01((81, 27), lambda r, c=c: 3 * (r // 9) + c,
                     lambda cc: cc)
        pw2 = _iota01((81, w.shape[0]), lambda r, c=c: 3 * (r % 9) + c,
                      lambda cc: cc)
        term = (_dotp(py, Yp, ((1,), (0,)), "rhs")
                * _dotp(pw2, wp, ((1,), (0,)), "rhs"))
        out = term if out is None else out + term
    return out


# k-minor row layout of the stacked linearization array JR_t (32, n):
# rows 0-17 Jc (j = 9 i + a), rows 18-23 Jp (18 + 3 i + b),
# rows 24-25 r (24 + i), rows 26-31 zero padding.
_JC0, _JP0, _R0 = 0, 18, 24


def _prod_cam90(x, _):
    """Per-row [Jc'Jc (81, r = 9a+d); Jc'r (9)] from stacked JR rows."""
    xp = _parts(x, "prod")
    out = None
    for i in range(2):
        pa = _iota01((90, x.shape[0]),
                     lambda r, i=i: 9 * i + jnp.where(r < 81, r // 9, r - 81),
                     lambda c: c)
        pb = _iota01((90, x.shape[0]),
                     lambda r, i=i: jnp.where(r < 81, 9 * i + r % 9,
                                              _R0 + i),
                     lambda c: c)
        term = (_dotp(pa, xp, ((1,), (0,)), "rhs")
                * _dotp(pb, xp, ((1,), (0,)), "rhs"))
        out = term if out is None else out + term
    return out


def _prod_pnt12(x, _):
    """Per-row [Jp'Jp (9, r = 3b+e); Jp'r (3)] from the (16, C) sublane
    window [16:32) of JR_t — Jp at rows 2-7, r at rows 8-9."""
    jp0, r0 = _JP0 - 16, _R0 - 16
    xp = _parts(x, "prod")
    out = None
    for i in range(2):
        pa = _iota01((12, x.shape[0]),
                     lambda r, i=i: jp0 + 3 * i + jnp.where(r < 9, r // 3,
                                                            r - 9),
                     lambda c: c)
        pb = _iota01((12, x.shape[0]),
                     lambda r, i=i: jnp.where(r < 9, jp0 + 3 * i + r % 3,
                                              r0 + i),
                     lambda c: c)
        term = (_dotp(pa, xp, ((1,), (0,)), "rhs")
                * _dotp(pb, xp, ((1,), (0,)), "rhs"))
        out = term if out is None else out + term
    return out


def hpp_inv_sym6_t(hpp_inv_f: jnp.ndarray, pnt_idx_rows) -> jnp.ndarray:
    """Packed-symmetric ``Hpp_inv`` per row, k-minor (8, n): the 6 unique
    entries [m00,m01,m02,m11,m12,m22] gathered by ``pnt_idx_rows``."""
    h6 = hpp_inv_f.reshape(-1, 9)[:, jnp.array([0, 1, 2, 4, 5, 8])]
    return gather_k_minor(pad_rows(h6.T, 8), pnt_idx_rows)


def wcw_cam_reduce(W_cam_t, c6_cam_t, cam_ids_sorted, cam_starts, ncams, *,
                   interpret=None):
    """Fused exact Schur-diagonal correction: per-camera sums of
    ``W_k Hpp_inv[pnt_k] W_k'`` -> (ncams, 81), one streaming pass over
    camera-sorted ``W_cam_t`` + packed Hpp_inv.  Replaces the chunked
    einsum + scatter-add (`ops/schur.py:schur_diag_blocks`), the measured
    co-dominant per-iteration cost."""
    bounds = tile_bounds(cam_starts, ncams, SEG_TILE_WIDE)
    return seg_prod_reduce(
        W_cam_t, cam_ids_sorted, bounds, ncams, d_out=81, prod=_prod_wcw,
        x2_t=c6_cam_t, P=SEG_TILE_WIDE, interpret=interpret)


def jtj_cam_reduce(JR_cam_t, cam_ids_sorted, cam_starts, ncams, *,
                   interpret=None):
    """Fused camera-side Gauss-Newton assembly: (ncams, 90) =
    [Hcc | g_c] per-camera sums from the stacked camera-sorted
    linearization rows."""
    bounds = tile_bounds(cam_starts, ncams, SEG_TILE_WIDE)
    return seg_prod_reduce(
        JR_cam_t, cam_ids_sorted, bounds, ncams, d_out=90,
        prod=_prod_cam90, P=SEG_TILE_WIDE, interpret=interpret)


def jtj_pnt_reduce(JR_t, pnt_idx, pnt_starts, npnts, *, interpret=None):
    """Fused point-side Gauss-Newton assembly: (npnts, 12) = [Hpp | g_p]
    per-point sums, streaming only the [16:32) sublane window of JR_t."""
    bounds = tile_bounds(pnt_starts, npnts)
    return seg_prod_reduce(
        JR_t, pnt_idx, bounds, npnts, d_out=12, prod=_prod_pnt12,
        x1_rows=(16, 16), interpret=interpret)


def w_from_jr(JR_t: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """k-minor (K_PAD, n) ``W_k = Jc_k' Jp_k`` from a stacked JR array
    (either point- or camera-sorted): row-gathered elementwise FMAs —
    W[3a+b] = sum_i Jc[9i+a] * Jp[3i+b]."""
    r = jnp.arange(27)
    a, b = r // 3, r % 3
    Jc = JR_t[_JC0:_JC0 + 18].astype(jnp.float32)
    Jp = JR_t[_JP0:_JP0 + 6].astype(jnp.float32)
    out = Jc[a] * Jp[b] + Jc[9 + a] * Jp[3 + b]
    if dtype is not None:
        out = out.astype(dtype)
    return jnp.pad(out, ((0, K_PAD - 27), (0, 0)))


def wtv_point_reduce(W_t, v, pnt_idx, cam_idx, pnt_starts, npnts, *,
                     hpp_inv_f=None, add_gp=None, sign=1.0,
                     out_k8=False, interpret=None):
    """Fused ``segment_sum_pnt(W_k' v[cam_k])``.  ``W_t`` is k-minor
    (K_PAD, n_pad); rows must be point-sorted.  Optionally folds
    ``sign * Hpp_inv @ (. + add_gp)`` in-kernel; output is (npnts, 3),
    or k-minor (8, npnts) with ``out_k8`` for a gather-only handoff to
    :func:`wt_cam_reduce` (composable with the fold — the matvec streams
    raw ``W`` and solves the point diagonal in-kernel)."""
    if interpret is None:
        interpret = INTERPRET
    bounds = tile_bounds(pnt_starts, npnts)
    if v.shape[0] > GATHER_TABLE_MAX_CAMS:
        # Pre-gathered v rides in W's storage dtype when that is bf16:
        # the bf16 W already bounds the product accuracy, and the
        # (16, n) operand is half the pass's non-W traffic at Final.
        vt = pad_rows(v.T, 16)
        if W_t.dtype == jnp.bfloat16:
            vt = vt.astype(jnp.bfloat16)
        xt = gather_k_minor(vt, cam_idx)
        return _seg_block_reduce(
            W_t, pnt_idx, bounds, npnts, d_x=9, d_out=3,
            xt_obs=xt, diag=hpp_inv_f, add=add_gp, sign=sign,
            out_k8=out_k8, out_dtype=v.dtype, interpret=interpret)
    return _seg_block_reduce(
        W_t, pnt_idx, bounds, npnts, d_x=9, d_out=3,
        cam_row=cam_idx, table=v, diag=hpp_inv_f, add=add_gp, sign=sign,
        out_k8=out_k8, out_dtype=v.dtype, interpret=interpret)


def wt_cam_reduce(W_cam_t, xt8_cam, cam_ids_sorted, cam_starts, ncams, *,
                  out_dtype=None, interpret=None):
    """Fused ``segment_sum_cam(W_k t_k)`` over camera-sorted rows
    (``W_cam_t`` = k-minor 9x3 blocks permuted by ``cam_perm`` — the
    matvec streams ``Y = W Hpp_inv`` here; ``xt8_cam`` the k-minor
    (8, n_pad) row-padded 3-vector operand in the same order).
    ``out_dtype``: output override — pass f32 when the operand rides in
    bf16 (the kernel accumulates in f32 regardless)."""
    if interpret is None:
        interpret = INTERPRET
    bounds = tile_bounds(cam_starts, ncams)
    return _seg_block_reduce(
        W_cam_t, cam_ids_sorted, bounds, ncams, d_x=3, d_out=9,
        xt_obs=xt8_cam, out_dtype=out_dtype, interpret=interpret)


def layout_ok(s) -> bool:
    """Sorted-layout prerequisites shared by every kernel here:
    point-sorted rows, camera permutation metadata present."""
    return (s.pnt_starts is not None and s.pnt_perm is None
            and s.cam_perm is not None and s.cam_starts is not None)


def available(s) -> bool:
    """Layout prerequisites on a GNBlocks/SchurSystem: point-sorted rows,
    camera permutation metadata, 128-divisible padded row count.  f64 is
    excluded — the kernels accumulate in f32 (the TPU native width); a
    float64 solve keeps the XLA path rather than silently dropping
    precision."""
    W = s.W_f if s.W_f is not None else getattr(s, "W_t", None)
    if W is None:
        return False
    n = W.size // 27 if s.W_f is not None else W.shape[1]
    return (layout_ok(s) and W.dtype != jnp.float64 and n % 128 == 0)


def problem_ok(problem, dtype) -> bool:
    """Can the k-minor assembly + fused solve path run on this problem?"""
    return (layout_ok(problem) and jnp.dtype(dtype) != jnp.float64
            and problem.nobs_pad % 128 == 0)
