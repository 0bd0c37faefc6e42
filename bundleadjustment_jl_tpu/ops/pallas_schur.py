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
walks its row range in fixed-size chunks with manual HBM→VMEM DMA,
computes the per-row 9x3 block product in VMEM, and reduces rows to
segments with a local one-hot matmul on the MXU (exact: 0/1 one-hot,
``precision=HIGHEST``).  The accumulator lives in VMEM; only the final
(P, d) tile is written back.  Per-observation HBM traffic of a full
matvec drops from ~300 B/obs to ~130 B/obs (f32) and the op count per
matvec from ~15 to ~6.

Instantiations (both wired behind ``PALLAS_MODE`` in `ops/schur.py`):

- point direction (:func:`wtv_point_reduce`): rows in native point-sorted
  order; gathers ``v[cam_idx]`` *in-kernel* via a camera one-hot against
  the full (ncams, 9) table kept in VMEM (cameras are few; the table is
  KBs), computes ``W' v`` per row, reduces per point, and optionally
  folds the ``sign * Hpp_inv @ (. + add)`` 3x3 apply into the same
  kernel (covers both the matvec inner solve and `back_substitute`).
- camera direction (:func:`wt_cam_reduce`): rows in camera-sorted order
  (``W[cam_perm]``, built once per `reduce_system`), per-row ``W t``,
  reduced per camera.

Reference role: the sweep this replaces is the reference's per-iteration
LDL^T factorization/solve (`/root/reference/src/ldl_aux.jl:122-201`);
the TPU-native speed-of-light version is this fused streaming pass.

Mosaic notes: all small constant matrices (the 9->27 / 3->27 expansions
and 27->9 / 27->3 group-sum reducers) are built *in kernel* from 2-D
iota comparisons — no array constants, no transposes, no lane-crossing
reshapes.  The only dynamic machinery is a `fori_loop` with a traced
trip count and `make_async_copy` at dynamic (clamp-masked) row offsets.
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
# code path, no Mosaic compile).  Set by tests/conftest-side fixtures.
INTERPRET = False

# Rows per DMA chunk and segments per grid tile. C is the streaming unit
# (C*27 floats of W per DMA); P bounds the one-hot (P, C) local reduction
# and the VMEM accumulator (P, d).
CHUNK_ROWS = 512
SEG_TILE = 512

# In-kernel camera one-hot gather costs O(ncams*C) MXU FLOPs per chunk;
# past this camera count an XLA pre-gather of v[cam_idx] (36 B/row extra
# HBM traffic) is cheaper than the one-hot contraction.
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


def _dot(a, b, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(a, b, dims, precision=_HIGH,
                               preferred_element_type=jnp.float32)


def _seg_reduce_kernel(bounds_ref, idx_ref, w_ref, x_ref, cam_ref,
                       table_ref, diag_ref, add_ref, out_ref,
                       w_s, xc_s, idx_s, acc, sems, *,
                       C, P, d_x, d_out, n_pad, gather_table, fold_diag,
                       has_add, sign):
    """One segment tile: stream rows [bounds[t], bounds[t+1]) in C-chunks.

    Refs (presence controlled by the static flags):
      bounds_ref  (ntiles+1,) SMEM  scalar-prefetch row bounds per tile
      idx_ref     (1, n_pad)  ANY   segment id per row (sorted)
      w_ref       (n_pad, 27) ANY   W blocks, row-major (a, b) -> 3a+b
      x_ref       (n_pad, d_x) ANY  per-row operand  [not gather_table]
      cam_ref     (1, n_pad)  ANY   camera id per row    [gather_table]
      table_ref   (ncams, 9)  VMEM  full camera table    [gather_table]
      diag_ref    (P, 9)      VMEM  3x3 blocks to fold      [fold_diag]
      add_ref     (P, 3)      VMEM  additive pre-fold term    [has_add]
      out_ref     (P, d_out)  VMEM  output tile
    Scratch: w_s (C,27), xc_s ((1,C) ids | (C,d_x) values), idx_s (1,C),
      acc (P,d_out) f32, sems DMA x3.
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    seg_base = t * P

    acc[:] = jnp.zeros_like(acc)
    nchunks = pl.cdiv(end - start, jnp.int32(C))

    # In-kernel 0/1 constants (c = 3a + b; x indexed by a or b).
    exp_m = (_iota01((9, 27), lambda r: r, lambda c: c // 3) if d_x == 9
             else _iota01((3, 27), lambda r: r, lambda c: c % 3))
    red_m = (_iota01((27, 9), lambda r: r // 3, lambda c: c) if d_out == 9
             else _iota01((27, 3), lambda r: r % 3, lambda c: c))

    def body(j, _):
        lo = start + j * C
        base = jnp.minimum(lo, n_pad - C)  # clamped re-reads are masked off
        src = cam_ref if gather_table else x_ref
        xc_slice = (src.at[:, pl.ds(base, C)] if gather_table
                    else src.at[pl.ds(base, C), :])
        cps = [pltpu.make_async_copy(w_ref.at[pl.ds(base, C), :], w_s,
                                     sems.at[0]),
               pltpu.make_async_copy(idx_ref.at[:, pl.ds(base, C)], idx_s,
                                     sems.at[1]),
               pltpu.make_async_copy(xc_slice, xc_s, sems.at[2])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        g = base + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        valid = jnp.logical_and(g >= lo, g < end)            # (1, C)

        if gather_table:
            # x rows = table[cam_id]: contract a (ncams, C) one-hot with
            # the table over dim 0 — no transposes.
            ncams = table_ref.shape[0]
            oh_t = (jax.lax.broadcasted_iota(jnp.int32, (ncams, C), 0)
                    == xc_s[:]).astype(jnp.float32)          # (ncams, C)
            x_rows = _dot(oh_t, table_ref[:].astype(jnp.float32),
                          (((0,), (0,)), ((), ())))          # (C, 9)
        else:
            x_rows = xc_s[:].astype(jnp.float32)             # (C, d_x)

        w_rows = w_s[:].astype(jnp.float32)                  # (C, 27)
        x_rep = _dot(x_rows, exp_m)                          # (C, 27)
        rows = _dot(w_rows * x_rep, red_m)                   # (C, d_out)

        # Local one-hot segment reduction: (P, C) @ (C, d_out).
        local = idx_s[:] - seg_base                          # (1, C)
        oh_seg = jnp.logical_and(
            jax.lax.broadcasted_iota(jnp.int32, (P, C), 0) == local,
            valid).astype(jnp.float32)
        acc[:] += _dot(oh_seg, rows)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    res = acc[:]
    if fold_diag:
        if has_add:
            res = res + add_ref[:].astype(jnp.float32)
        # out[p, a] = sum_b diag[p, 3a+b] * res[p, b]
        rep = _dot(res, _iota01((3, 9), lambda r: r, lambda c: c % 3))
        res = _dot(diag_ref[:].astype(jnp.float32) * rep,
                   _iota01((9, 3), lambda r: r // 3, lambda c: c))
    out_ref[:] = (sign * res).astype(out_ref.dtype)


def _seg_block_reduce(W_f, idx_row, bounds, nseg, *, d_x, d_out,
                      x_obs=None, cam_row=None, table=None,
                      diag=None, add=None, sign=1.0, out_dtype=None,
                      interpret=False):
    """Dispatch the fused kernel.  Exactly one of ``x_obs`` (pre-gathered
    per-row operand) or ``cam_row``+``table`` (in-kernel gather) is given.
    """
    n_pad = W_f.size // 27
    C = min(CHUNK_ROWS, n_pad)
    P = SEG_TILE
    gather_table = table is not None
    fold_diag = diag is not None
    has_add = add is not None
    out_dtype = out_dtype or (table.dtype if gather_table else x_obs.dtype)
    ntiles = bounds.shape[0] - 1

    kern = functools.partial(
        _seg_reduce_kernel, C=C, P=P, d_x=d_x, d_out=d_out, n_pad=n_pad,
        gather_table=gather_table, fold_diag=fold_diag, has_add=has_add,
        sign=sign)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec, any_spec]               # idx_row, W
    args = [idx_row.reshape(1, n_pad).astype(jnp.int32),
            W_f.reshape(n_pad, 27)]
    if gather_table:
        in_specs += [any_spec, pl.BlockSpec(memory_space=pltpu.VMEM)]
        args += [cam_row.reshape(1, n_pad).astype(jnp.int32), table]
    else:
        in_specs += [any_spec]
        args += [x_obs.reshape(n_pad, d_x)]
    if fold_diag:
        in_specs.append(pl.BlockSpec((P, 9), lambda t, b: (t, 0)))
        args.append(diag.reshape(nseg, 9))
        if has_add:
            in_specs.append(pl.BlockSpec((P, 3), lambda t, b: (t, 0)))
            args.append(add.reshape(nseg, 3))

    def kernel(bounds_ref, *refs):
        it = iter(refs)
        idx_ref, w_ref = next(it), next(it)
        if gather_table:
            cam_ref, table_ref, x_ref = next(it), next(it), None
        else:
            x_ref, cam_ref, table_ref = next(it), None, None
        diag_ref = next(it) if fold_diag else None
        add_ref = next(it) if has_add else None
        out_ref = next(it)
        w_s, xc_s, idx_s, acc, sems = it
        kern(bounds_ref, idx_ref, w_ref, x_ref, cam_ref, table_ref,
             diag_ref, add_ref, out_ref, w_s, xc_s, idx_s, acc, sems)

    xc_shape = (1, C) if gather_table else (C, d_x)
    xc_dtype = jnp.int32 if gather_table else x_obs.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((P, d_out), lambda t, b: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((C, 27), args[1].dtype),
            pltpu.VMEM(xc_shape, xc_dtype),
            pltpu.VMEM((1, C), jnp.int32),
            pltpu.VMEM((P, d_out), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nseg, d_out), out_dtype),
        interpret=interpret,
    )(bounds, *args)


def tile_bounds(starts: jnp.ndarray, nseg: int,
                P: int | None = None) -> jnp.ndarray:
    """Row bounds per segment tile: bounds[t] = starts[min(t*P, nseg)]."""
    P = P or SEG_TILE
    ntiles = -(-nseg // P)
    idx = jnp.minimum(jnp.arange(ntiles + 1) * P, nseg)
    return starts[idx].astype(jnp.int32)


def wtv_point_reduce(W_f, v, pnt_idx, cam_idx, pnt_starts, npnts, *,
                     hpp_inv_f=None, add_gp=None, sign=1.0,
                     interpret=None):
    """Fused ``segment_sum_pnt(W_k' v[cam_k])`` with optional in-kernel
    ``sign * Hpp_inv @ (. + add_gp)`` fold.  Rows must be point-sorted."""
    if interpret is None:
        interpret = INTERPRET
    bounds = tile_bounds(pnt_starts, npnts)
    if v.shape[0] > GATHER_TABLE_MAX_CAMS:
        return _seg_block_reduce(
            W_f, pnt_idx, bounds, npnts, d_x=9, d_out=3,
            x_obs=v[cam_idx], diag=hpp_inv_f, add=add_gp, sign=sign,
            out_dtype=v.dtype, interpret=interpret)
    return _seg_block_reduce(
        W_f, pnt_idx, bounds, npnts, d_x=9, d_out=3,
        cam_row=cam_idx, table=v, diag=hpp_inv_f, add=add_gp, sign=sign,
        out_dtype=v.dtype, interpret=interpret)


def wt_cam_reduce(W_cam_f, t_obs_cam, cam_ids_sorted, cam_starts, ncams, *,
                  interpret=None):
    """Fused ``segment_sum_cam(W_k t_k)`` over camera-sorted rows
    (``W_cam_f`` = W permuted by ``cam_perm``; ``cam_ids_sorted`` the
    correspondingly permuted camera ids)."""
    if interpret is None:
        interpret = INTERPRET
    bounds = tile_bounds(cam_starts, ncams)
    return _seg_block_reduce(
        W_cam_f, cam_ids_sorted, bounds, ncams, d_x=3, d_out=9,
        x_obs=t_obs_cam, interpret=interpret)


def available(s) -> bool:
    """Layout prerequisites on a BAProblem/SchurSystem: point-sorted rows
    plus the camera permutation metadata.  f64 is excluded — the kernels
    accumulate in f32 (the TPU native width); a float64 solve keeps the
    XLA path rather than silently dropping precision."""
    return (s.pnt_starts is not None and s.pnt_perm is None
            and s.cam_perm is not None and s.cam_starts is not None
            and s.W_f.dtype != jnp.float64)
