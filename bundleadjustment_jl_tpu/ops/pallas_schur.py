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
0/1 one-hot, ``precision=HIGHEST``).  The accumulator lives in VMEM;
only the final per-tile output is written back.

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
# (the dispatcher halves it down to 128 until it does).
CHUNK_ROWS = 512
SEG_TILE = 512

# Sublane-padded row count of the k-minor W (27 → 32: f32 tiling is 8).
K_PAD = 32

# In-kernel camera one-hot gather costs O(ncams*C) MXU FLOPs per chunk;
# past this camera count an XLA pre-gather of v (64 B/row of padded
# 9-vector traffic) is cheaper than the one-hot contraction.
GATHER_TABLE_MAX_CAMS = 1024

_HIGH = jax.lax.Precision.HIGHEST


def set_mode(on: bool) -> None:
    global PALLAS_MODE
    PALLAS_MODE = bool(on)


def _iota01(shape, row_fn, col_fn):
    """0/1 f32 matrix from a comparison of two iota-derived index maps."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (row_fn(r) == col_fn(c)).astype(jnp.float32)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), precision=_HIGH,
                               preferred_element_type=jnp.float32)


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
    Scratch: wt_s (K_PAD,C), xc_s ((1,C) ids | (dxp,C) values),
      idx_s (1,C), acc ((P,d_out) | (d_out,P)) f32, sems DMA x3.
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
    dxe = 9 if gather_table else xc_s.shape[0]
    exp_m = (_iota01((K_PAD, dxe), lambda r: r // 3, lambda c: c)
             if d_x == 9
             else _iota01((K_PAD, dxe), lambda r: r % 3, lambda c: c))
    red_m = (_iota01((d_out, K_PAD), lambda r: r, lambda c: c // 3)
             if d_out == 9
             else _iota01((d_out, K_PAD), lambda r: r, lambda c: c % 3))

    def body(j, _):
        base = lo0 + j * C                     # C-aligned, base+C <= n_pad
        src = cam_ref if gather_table else xt_ref
        cps = [pltpu.make_async_copy(wt_ref.at[:, pl.ds(base, C)], wt_s,
                                     sems.at[0]),
               pltpu.make_async_copy(idx_ref.at[:, pl.ds(base, C)], idx_s,
                                     sems.at[1]),
               pltpu.make_async_copy(src.at[:, pl.ds(base, C)], xc_s,
                                     sems.at[2])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        if gather_table:
            # x columns = table[cam_id]': contract a (ncams, C) one-hot
            # with the table over dim 0 — no transposes.
            ncams = table_ref.shape[0]
            oh_t = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                    == xc_s[:]).astype(jnp.float32)            # (ncams, C)
            x_t = _dot(table_ref[:].astype(jnp.float32), oh_t,
                       ((0,), (0,)))                           # (9, C)
        else:
            x_t = xc_s[:].astype(jnp.float32)                  # (dxp, C)

        x_rep = _dot(exp_m, x_t, ((1,), (0,)))                 # (K_PAD, C)
        prod = wt_s[:].astype(jnp.float32) * x_rep             # (K_PAD, C)
        rows_t = _dot(red_m, prod, ((1,), (0,)))               # (d_out, C)

        # Local one-hot segment reduction: rows whose segment falls
        # outside [seg_base, seg_base+P) (neighbors in the shared aligned
        # window) match no one-hot row and drop out exactly.
        local = idx_s[:] - seg_base                            # (1, C)
        oh_seg = (jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
                  == local).astype(jnp.float32)                # (P, C)
        if out_k8:
            acc[:] += _dot(rows_t, oh_seg, ((1,), (1,)))       # (d_out, P)
        else:
            acc[:] += _dot(oh_seg, rows_t, ((1,), (1,)))       # (P, d_out)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    res = acc[:]
    if fold_diag:
        if has_add:
            res = res + add_ref[:].astype(jnp.float32)
        # out[p, a] = sum_b diag[p, 3a+b] * res[p, b]
        rep = _dot(res, _iota01((3, 9), lambda r: r, lambda c: c % 3),
                   ((1,), (0,)))                               # (P, 9)
        res = _dot(diag_ref[:].astype(jnp.float32) * rep,
                   _iota01((9, 3), lambda r: r // 3, lambda c: c),
                   ((1,), (0,)))                               # (P, 3)
    elif has_add:
        # post-reduce additive term (no diagonal fold) — serves
        # back_substitute's  -(Hpp_inv g_p + segsum(Y' dc))  form.
        res = res + add_ref[:].astype(jnp.float32)
    res = sign * res
    if out_k8:
        # (d_out, P) -> zero-padded (8, P) via a 0/1 row placer.
        res = _dot(_iota01((8, res.shape[0]), lambda r: r, lambda c: c),
                   res, ((1,), (0,)))
    out_ref[:] = res.astype(out_ref.dtype)


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
    n_pad = W_t.shape[1]
    C = _chunk_rows(n_pad)
    P = SEG_TILE
    gather_table = table is not None
    fold_diag = diag is not None
    has_add = add is not None
    out_dtype = out_dtype or (table.dtype if gather_table else xt_obs.dtype)
    ntiles = bounds.shape[0] - 1

    kern = functools.partial(
        _seg_reduce_kernel, C=C, P=P, d_x=d_x, d_out=d_out,
        gather_table=gather_table, fold_diag=fold_diag, has_add=has_add,
        out_k8=out_k8, sign=sign)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec, any_spec]               # idx_row, W_t
    args = [idx_row.reshape(1, n_pad).astype(jnp.int32), W_t]
    if gather_table:
        in_specs += [any_spec, pl.BlockSpec(memory_space=pltpu.VMEM)]
        args += [cam_row.reshape(1, n_pad).astype(jnp.int32), table]
    else:
        in_specs += [any_spec]
        args += [xt_obs]
    if fold_diag:
        in_specs.append(pl.BlockSpec((P, 9), lambda t, b: (t, 0)))
        args.append(diag.reshape(nseg, 9))
    if has_add:
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
        acc_shape = (d_out, P)
    else:
        out_spec = pl.BlockSpec((P, d_out), lambda t, b: (t, 0))
        out_shape = jax.ShapeDtypeStruct((nseg, d_out), out_dtype)
        acc_shape = (P, d_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((K_PAD, C), W_t.dtype),
            pltpu.VMEM(xc_shape, xc_dtype),
            pltpu.VMEM((1, C), jnp.int32),
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
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
    entries 27..31 zero (Mosaic DMA slices need 8-multiple sublanes)."""
    Wt = W_f.reshape(-1, 27).T
    return jnp.pad(Wt, ((0, K_PAD - 27), (0, 0)))


def pad_rows(x_t: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Zero-pad a k-minor (d, n) operand to ``rows`` sublanes."""
    return jnp.pad(x_t, ((0, rows - x_t.shape[0]), (0, 0)))


def y_k_minor(W_t, hpp_inv_f, pnt_idx, dtype=None) -> jnp.ndarray:
    """k-minor (K_PAD, n_pad) of ``Y_k = W_k Hpp_inv[pnt_k]`` computed
    entirely in k-minor space: three row-permuted elementwise
    multiply-adds over (27, n) arrays.  An einsum over (n, 9, 3)-shaped
    operands would tile-pad 19-76x on TPU (measured 10.4 GB at
    Dubrovnik-356 scale) — small minor dims must never touch the two
    minor axes of a large array."""
    n = W_t.shape[1]
    C_t = hpp_inv_f.reshape(-1, 9).T[:, pnt_idx]          # (9, n) k-minor
    r = jnp.arange(27)
    a3, c = (r // 3) * 3, r % 3
    Wf = W_t[:27].astype(jnp.float32)
    Cf = C_t.astype(jnp.float32)
    # Y[3a+c] = sum_b W[3a+b] * Cinv[3b+c]
    out = jnp.zeros((27, n), jnp.float32)
    for b in range(3):
        out = out + Wf[a3 + b] * Cf[3 * b + c]
    if dtype is not None:
        out = out.astype(dtype)
    return jnp.pad(out, ((0, K_PAD - 27), (0, 0)))


def wtv_point_reduce(W_t, v, pnt_idx, cam_idx, pnt_starts, npnts, *,
                     hpp_inv_f=None, add_gp=None, sign=1.0,
                     out_k8=False, interpret=None):
    """Fused ``segment_sum_pnt(W_k' v[cam_k])``.  ``W_t`` is k-minor
    (K_PAD, n_pad); rows must be point-sorted.  Either fold
    ``sign * Hpp_inv @ (. + add_gp)`` in-kernel (output (npnts, 3)), or
    return the raw sums k-minor as (8, npnts) (``out_k8``, mutually
    exclusive with the fold) for a gather-only handoff to
    :func:`wt_cam_reduce`."""
    if interpret is None:
        interpret = INTERPRET
    assert not (out_k8 and (hpp_inv_f is not None or add_gp is not None))
    bounds = tile_bounds(pnt_starts, npnts)
    if v.shape[0] > GATHER_TABLE_MAX_CAMS:
        xt = pad_rows(v.T, 16)[:, cam_idx]
        return _seg_block_reduce(
            W_t, pnt_idx, bounds, npnts, d_x=9, d_out=3,
            xt_obs=xt, diag=hpp_inv_f, add=add_gp, sign=sign,
            out_k8=out_k8, out_dtype=v.dtype, interpret=interpret)
    return _seg_block_reduce(
        W_t, pnt_idx, bounds, npnts, d_x=9, d_out=3,
        cam_row=cam_idx, table=v, diag=hpp_inv_f, add=add_gp, sign=sign,
        out_k8=out_k8, out_dtype=v.dtype, interpret=interpret)


def wt_cam_reduce(W_cam_t, xt8_cam, cam_ids_sorted, cam_starts, ncams, *,
                  interpret=None):
    """Fused ``segment_sum_cam(W_k t_k)`` over camera-sorted rows
    (``W_cam_t`` = k-minor 9x3 blocks permuted by ``cam_perm`` — the
    matvec streams ``Y = W Hpp_inv`` here; ``xt8_cam`` the k-minor
    (8, n_pad) row-padded 3-vector operand in the same order)."""
    if interpret is None:
        interpret = INTERPRET
    bounds = tile_bounds(cam_starts, ncams)
    return _seg_block_reduce(
        W_cam_t, cam_ids_sorted, bounds, ncams, d_x=3, d_out=9,
        xt_obs=xt8_cam, interpret=interpret)


def available(s) -> bool:
    """Layout prerequisites on a BAProblem/SchurSystem: point-sorted rows,
    camera permutation metadata, 128-divisible padded row count.  f64 is
    excluded — the kernels accumulate in f32 (the TPU native width); a
    float64 solve keeps the XLA path rather than silently dropping
    precision."""
    return (s.pnt_starts is not None and s.pnt_perm is None
            and s.cam_perm is not None and s.cam_starts is not None
            and s.W_f.dtype != jnp.float64
            and (s.W_f.size // 27) % 128 == 0)
