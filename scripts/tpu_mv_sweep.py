"""Sweep the Pallas kernel tile constants (C, P) on the current backend.

The matvec measures ~22 GB/s effective vs a ~2.4 ms/400 MB streaming
bound — the gap is per-chunk fixed cost (DMA issue + semaphores + loop
overhead x 2657 chunks/pass at C=512, Dubrovnik-356 scale).  This probe
times schur_matvec and the two assembly reduces at one (C, P) setting;
run it once per env setting:

    BA_PALLAS=1 BA_PALLAS_CHUNK=2048 python scripts/tpu_mv_sweep.py

Methodology: scripts/_bench_util.py (arrays as jit args, loop-amortized,
fetch-bracketed).
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from _bench_util import timed  # noqa: E402

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.ops import pallas_schur  # noqa: E402
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks  # noqa: E402
from bundleadjustment_jl_tpu.ops.schur import (  # noqa: E402
    reduce_system, schur_matvec)


def main(ncams=356, npnts=226730, obs_per_pnt=6):
    pallas_schur.set_mode(True)
    print(f"backend={jax.default_backend()} C={pallas_schur.CHUNK_ROWS} "
          f"P={pallas_schur.SEG_TILE} Pw={pallas_schur.SEG_TILE_WIDE}",
          flush=True)
    problem, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                               obs_per_pnt=obs_per_pnt, noise_px=1.0,
                               perturb=2e-2, seed=1, dtype=jnp.float32,
                               pad_obs_to=512)
    n = problem.nobs_pad
    blocks = jax.jit(lambda p: assemble_blocks(
        p, with_jr=False, kminor=True))(problem)
    sys_ = jax.jit(reduce_system)(problem, blocks, jnp.float32(1e2))
    f32 = 4

    def mv(c, s):
        u = schur_matvec(s, jnp.full_like(s.b, 1.0) * (1 + c * 1e-30))
        return c + u[0, 0] * 1e-30

    timed("schur_matvec", mv, jnp.float32(0.0), (sys_,),
          nbytes=(2 * 32 + 16 + 8 + 2 * 4) * f32 * n, n_hi=32)

    # bf16 W storage variant (the facto_dtype=bf16 matvec configuration):
    # halves the streamed W bytes; measures whether the byte saving
    # survives the in-kernel upconvert (BENCH_r02 showed a regression).
    if os.environ.get("BA_SWEEP_WDTYPE", "") == "bf16":
        sys_bf = sys_._replace(
            W_t=None if sys_.W_t is None else sys_.W_t.astype(jnp.bfloat16),
            W_cam_t=None if sys_.W_cam_t is None
            else sys_.W_cam_t.astype(jnp.bfloat16))
        timed("schur_matvec_bf16W", mv, jnp.float32(0.0), (sys_bf,),
              nbytes=(32 + 16 + 8 + 2 * 4) * f32 * n, n_hi=32)

    # jtj reduces need the stacked JR arrays; rebuild once.
    from bundleadjustment_jl_tpu.ops import pallas_linearize
    cxw = jax.jit(lambda p: pallas_linearize.pack_operands(
        p.cams, p.points, p.cam_idx, p.pnt_idx, p.pt2d, p.w))(problem)
    JR_t, W_t = jax.jit(pallas_linearize.linearize_w_kminor)(cxw)
    JR_cam_t = jax.jit(lambda a, p: a[:, p.cam_perm])(JR_t, problem)

    def lin(c, x):
        jr, w = pallas_linearize.linearize_w_kminor(x * (1 + c * 1e-30))
        return c + jr[24, 0] * 1e-30

    timed("linearize_w_kminor", lin, jnp.float32(0.0), (cxw,),
          nbytes=(16 + 64) * f32 * n)

    def cam90(c, a, p):
        out = pallas_schur.jtj_cam_reduce(
            a * (1 + c * 1e-30), p.cam_idx[p.cam_perm], p.cam_starts,
            p.ncams)
        return c + out[0, 0] * 1e-30

    timed("jtj_cam_reduce", cam90, jnp.float32(0.0), (JR_cam_t, problem),
          nbytes=32 * f32 * n)

    def pnt12(c, a, p):
        out = pallas_schur.jtj_pnt_reduce(
            a * (1 + c * 1e-30), p.pnt_idx, p.pnt_starts, p.npnts)
        return c + out[0, 0] * 1e-30

    timed("jtj_pnt_reduce", pnt12, jnp.float32(0.0), (JR_t, problem),
          nbytes=16 * f32 * n)

    # whole-assembly timing (in scatter mode this is the fused one-pass
    # mega-kernel; otherwise linearize + 2 reduce passes + permutes)
    def asm(c, p, cams, pts):
        # cams must depend on the carry or XLA hoists the whole assembly
        # out of the fori_loop (loop-invariant code motion) and the probe
        # times a single execution.
        b = assemble_blocks(p, cams * (1 + c * 1e-30), pts,
                            with_jr=False, kminor=True)
        return c + b.obj * 1e-30

    scatter = pallas_schur.CAM_SCATTER and ncams <= 1024
    asm_bytes = (8 + 32) * f32 * n if scatter else (16 + 64 + 48) * f32 * n
    timed("assemble_kminor", asm, jnp.float32(0.0),
          (problem, problem.cams * (1 + 1e-12), problem.points),
          nbytes=asm_bytes, n_hi=8)

    dma_probe(n)


def dma_probe(n, P=512):
    """Per-chunk fixed-cost probe: a minimal streaming kernel with the
    SAME structure as `_seg_reduce_kernel` (double-buffered fori_loop,
    one (32, C) big DMA) plus 0/1/2 extra (1, C) small DMAs and a token
    reduce. The delta between nsmall=0 and nsmall=2 is the cost folding
    the id rows into W would recover; the C-scaling of nsmall=0 is the
    irreducible per-chunk overhead (loop + semaphores + reduce)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = pallas_schur._chunk_rows(n)
    f32 = 4

    def kern(big_ref, s1_ref, s2_ref, out_ref, big_s, s1_s, s2_s, acc,
             sems, *, nsmall):
        nchunks = n // C
        copies = [(lambda j: big_ref.at[:, pl.ds(j * C, C)], big_s)]
        if nsmall >= 1:
            copies.append((lambda j: s1_ref.at[:, pl.ds(j * C, C)], s1_s))
        if nsmall >= 2:
            copies.append((lambda j: s2_ref.at[:, pl.ds(j * C, C)], s2_s))
        acc[:] = jnp.zeros_like(acc)
        pallas_schur._dma_start(copies, 0, 0, sems)

        def body(j, _):
            slot = jax.lax.rem(j, jnp.int32(2))

            @pl.when(j + 1 < nchunks)
            def _():
                pallas_schur._dma_start(
                    copies, j + 1, jax.lax.rem(j + 1, jnp.int32(2)), sems)

            pallas_schur._dma_wait(copies, j, slot, sems)
            x = big_s[slot].astype(jnp.float32)
            if nsmall >= 1:
                x = x + s1_s[slot].astype(jnp.float32)
            if nsmall >= 2:
                x = x + s2_s[slot].astype(jnp.float32)
            acc[:] += jnp.sum(x, axis=1, keepdims=True)
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)
        out_ref[:] = acc[:]

    big = jnp.ones((32, n), jnp.float32)
    s1 = jnp.ones((1, n), jnp.float32)
    s2 = jnp.ones((1, n), jnp.float32)
    for nsmall in (0, 1, 2):
        f = pl.pallas_call(
            functools.partial(kern, nsmall=nsmall),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec((32, 1), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((32, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 32, C), jnp.float32),
                pltpu.VMEM((2, 1, C), jnp.float32),
                pltpu.VMEM((2, 1, C), jnp.float32),
                pltpu.VMEM((32, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            interpret=pallas_schur.INTERPRET,
        )

        def run(c, a, b1, b2):
            out = f(a * (1 + c * 1e-30), b1, b2)
            return c + out[0, 0] * 1e-30

        timed(f"dma_probe_nsmall{nsmall}", run, jnp.float32(0.0),
              (big, s1, s2), nbytes=(32 + nsmall) * f32 * n)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
