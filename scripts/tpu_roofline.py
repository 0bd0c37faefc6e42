"""Primitive-level roofline measurement on the current backend.

Times the individual memory-access patterns the LM inner loop is built
from (stream, gather, scatter-add, permutation, cumsum expansion, block
products, one-hot matmul) with the argument-passing loop-amortized harness
(`_bench_util.py` — see its methodology notes), reporting achieved GB/s
against per-pattern bytes moved. Basis for the gather-free design in
`ops/gatherfree.py` and the layout notes in docs/performance.md.

Usage: python scripts/tpu_roofline.py [nobs ncams npnts]
"""

import sys

import numpy as np

import jax

# Persistent XLA compile cache: remote-TPU compiles run minutes per shape;
# cached executables load in seconds (safe no-op on CPU).
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from _bench_util import timed  # noqa: E402


def main(nobs=1 << 20, ncams=1024, npnts=1 << 17):
    print(f"backend={jax.default_backend()} nobs={nobs} ncams={ncams} "
          f"npnts={npnts}", flush=True)
    rng = np.random.default_rng(0)
    xflat = jnp.asarray(rng.standard_normal(nobs * 27), jnp.float32)
    v9 = jnp.asarray(rng.standard_normal((nobs, 9)), jnp.float32)
    v3 = jnp.asarray(rng.standard_normal((nobs, 3)), jnp.float32)
    cam_idx = jnp.asarray(rng.integers(0, ncams, nobs), jnp.int32)
    pnt_sorted = jnp.asarray(np.sort(rng.integers(0, npnts, nobs)),
                             jnp.int32)
    ctable = jnp.asarray(rng.standard_normal((ncams, 9)), jnp.float32)
    ptable = jnp.asarray(rng.standard_normal((npnts, 3)), jnp.float32)
    starts = jnp.asarray(
        np.searchsorted(np.asarray(pnt_sorted), np.arange(npnts + 1))
        .astype(np.int32))
    perm = jnp.asarray(rng.permutation(nobs).astype(np.int32))
    inv = jnp.asarray(np.argsort(np.asarray(perm)).astype(np.int32))

    z27 = jnp.zeros((nobs, 27), jnp.float32)
    z9 = jnp.zeros((nobs, 9), jnp.float32)
    z3 = jnp.zeros((nobs, 3), jnp.float32)

    # 1. stream: read + write nobs*27 f32 (flat and 2-D layouts)
    timed("stream flat (N*27,)",
          lambda c, x: x * (1 + c[0] * 1e-30) + c[0],
          jnp.zeros((nobs * 27,), jnp.float32), (xflat,),
          2 * nobs * 27 * 4)
    timed("stream (N,27)",
          lambda c, x: x * (1 + c[0, 0] * 1e-30) + c[0, 0],
          z27, (xflat.reshape(nobs, 27),), 2 * nobs * 27 * 4)
    timed("stream (27,N)",
          lambda c, x: x * (1 + c[0, 0] * 1e-30) + c[0, 0],
          jnp.zeros((27, nobs), jnp.float32), (xflat.reshape(27, nobs),),
          2 * nobs * 27 * 4)

    # 2. gathers
    timed("gather cams (N,9)",
          lambda c, t, i: (t * (1 + c[0, 0] * 1e-30))[i],
          z9, (ctable, cam_idx), nobs * 10 * 4)
    timed("gather pnts sorted (N,3)",
          lambda c, t, i: (t * (1 + c[0, 0] * 1e-30))[i],
          z3, (ptable, pnt_sorted), nobs * 4 * 4)
    timed("perm gather (N,27)[perm]",
          lambda c, x, p: (x * (1 + c[0, 0] * 1e-30))[p],
          z27, (xflat.reshape(nobs, 27), perm), 2 * nobs * 27 * 4)

    # 3. scatters
    timed("perm scatter .at[inv].set",
          lambda c, x, i: jnp.zeros_like(x).at[i].set(
              x * (1 + c[0, 0] * 1e-30)),
          z27, (xflat.reshape(nobs, 27), inv), 2 * nobs * 27 * 4)
    timed("scatter-add (N,9)->cams",
          lambda c, v, i: jax.ops.segment_sum(
              v * (1 + c[0, 0] * 1e-30), i, num_segments=ncams),
          jnp.zeros((ncams, 9), jnp.float32), (v9, cam_idx),
          nobs * 10 * 4)
    timed("scatter-add sorted (N,3)->pnts",
          lambda c, v, i: jax.ops.segment_sum(
              v * (1 + c[0, 0] * 1e-30), i, num_segments=npnts),
          jnp.zeros((npnts, 3), jnp.float32), (v3, pnt_sorted),
          nobs * 4 * 4)

    # 4. gather-free formulations (ops/gatherfree.py)
    from bundleadjustment_jl_tpu.ops.gatherfree import (
        expand_sorted, take_rows_onehot)
    timed("onehot-matmul gather cams",
          lambda c, t, i: take_rows_onehot(t * (1 + c[0, 0] * 1e-30), i),
          z9, (ctable, cam_idx), nobs * 10 * 4)
    timed("cumsum-expand pnts sorted",
          lambda c, t, s: expand_sorted(t * (1 + c[0, 0] * 1e-30), s,
                                        nobs),
          z3, (ptable, starts), nobs * 4 * 4)
    timed("cumsum (N,9)",
          lambda c, v: jnp.cumsum(v * (1 + c[0, 0] * 1e-30), axis=0),
          z9, (v9,), 2 * nobs * 9 * 4)

    # 5. block product W'v (both forms)
    from bundleadjustment_jl_tpu.ops.blockmul import wT_dot_a
    timed("W'v blockmul flat",
          lambda c, w, v: wT_dot_a(w, v * (1 + c[0, 0] * 1e-30)),
          z3, (xflat, v9), nobs * (27 + 9 + 3) * 4)
    timed("W'v einsum (N,9,3)",
          lambda c, w, v: jnp.einsum(
              "kab,ka->kb", w.reshape(-1, 9, 3),
              v * (1 + c[0, 0] * 1e-30)),
          z3, (xflat, v9), nobs * (27 + 9 + 3) * 4)

    # 6. MXU matmul rate
    A = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
    t = timed("matmul 4096^3 f32",
              lambda c, a: jnp.dot(c, a, preferred_element_type=c.dtype),
              A, (A,), 3 * 4096 * 4096 * 4)
    print(f"    -> {2 * 4096**3 / t / 1e12:.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
