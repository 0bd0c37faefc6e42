"""Primitive-level roofline measurement on the current backend.

Times the individual memory-access patterns the LM inner loop is built from
(stream, gather, scatter-add, segment reductions, block products) with the
loop-amortized dependent-chain methodology of `tpu_profile.py`, and reports
achieved GB/s against the per-pattern bytes moved. This is the basis for
deciding which ops need Pallas fusion and what "speed of light" means for
each (docs/performance.md).

Usage: python scripts/tpu_roofline.py [nobs ncams npnts N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def chain(fn, carry0, n):
    """Jitted fori_loop of n dependent applications of fn."""
    @jax.jit
    def run():
        return jax.lax.fori_loop(0, n, fn, carry0)
    return run


def timed(name, make, nbytes, n_hi=16, n_lo=1):
    f_hi = chain(*make(), n_hi)
    f_lo = chain(*make(), n_lo)
    r = f_hi()
    jax.tree_util.tree_map(
        lambda x: np.asarray(x).ravel()[0], r)  # force fetch
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], f_lo())
    t0 = time.perf_counter()
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], f_lo())
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], f_hi())
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / (n_hi - n_lo)
    gbs = nbytes / per / 1e9
    print(f"{name:<30} {1e3 * per:9.3f} ms  {gbs:8.1f} GB/s "
          f"({nbytes / 1e6:.1f} MB/op)", flush=True)
    return per


def main(nobs=1 << 20, ncams=1024, npnts=1 << 17, N=16):
    print(f"backend={jax.default_backend()} nobs={nobs} ncams={ncams} "
          f"npnts={npnts}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (nobs * 27,), jnp.float32)
    W = x.reshape(nobs, 27)
    v9 = jax.random.normal(k2, (nobs, 9), jnp.float32)
    cam_idx = jax.random.randint(k3, (nobs,), 0, ncams)
    pnt_idx = jnp.sort(jax.random.randint(k4, (nobs,), 0, npnts))
    table = jax.random.normal(k1, (ncams, 9), jnp.float32)
    ptable = jax.random.normal(k2, (npnts, 9), jnp.float32)

    # 1. pure stream: read + write nobs*27 f32
    def mk_stream():
        def body(i, c):
            return c * 1.0000001 + 1e-12
        return body, x

    timed("stream r+w (N,27)", mk_stream, 2 * x.size * 4)

    # 2. gather (ncams,9) rows by cam_idx -> (N,9)
    def mk_gather():
        def body(i, c):
            g = (table * (1 + c[0, 0] * 1e-30))[cam_idx]
            return g
        return body, jnp.zeros((nobs, 9), jnp.float32)

    timed("gather cams (N,9)", mk_gather, (nobs * 9 * 2 + nobs) * 4)

    # 3. gather (npnts,9) rows by sorted pnt_idx
    def mk_gather_p():
        def body(i, c):
            return (ptable * (1 + c[0, 0] * 1e-30))[pnt_idx]
        return body, jnp.zeros((nobs, 9), jnp.float32)

    timed("gather pnts sorted (N,9)", mk_gather_p,
          (nobs * 9 * 2 + nobs) * 4)

    # 4. scatter-add (N,9) -> (ncams,9)
    def mk_scatter():
        def body(i, c):
            s = jax.ops.segment_sum(v9 * (1 + c[0, 0] * 1e-30), cam_idx,
                                    num_segments=ncams)
            return s
        return body, jnp.zeros((ncams, 9), jnp.float32)

    timed("scatter-add (N,9)->cams", mk_scatter, (nobs * 10) * 4)

    # 5. scatter-add (N,9) -> (npnts,9) with SORTED ids
    def mk_scatter_p():
        def body(i, c):
            return jax.ops.segment_sum(v9 * (1 + c[0, 0] * 1e-30), pnt_idx,
                                       num_segments=npnts)
        return body, jnp.zeros((npnts, 9), jnp.float32)

    timed("scatter-add sorted (N,9)->pnts", mk_scatter_p, (nobs * 10) * 4)

    # 6. batched block product W'v: (N,27)x(N,9)->(N,3)
    from bundleadjustment_jl_tpu.ops.blockmul import wT_dot_a

    def mk_wtv():
        def body(i, c):
            return wT_dot_a(x, v9 * (1 + c[0, 0] * 1e-30))
        return body, jnp.zeros((nobs, 3), jnp.float32)

    timed("W'v blockmul (N,27)x(N,9)", mk_wtv, (nobs * (27 + 9 + 3)) * 4)

    # 7. einsum variant of the same
    def mk_wtv_e():
        def body(i, c):
            return jnp.einsum("kab,ka->kb", W, v9 * (1 + c[0, 0] * 1e-30))
        return body, jnp.zeros((nobs, 3), jnp.float32)

    timed("W'v einsum (N,9,3)x(N,9)", mk_wtv_e, (nobs * (27 + 9 + 3)) * 4)

    # 8. one-hot matmul reduction (N,9)->(ncams,9) on the MXU
    def mk_onehot():
        ids = cam_idx.astype(jnp.int32)

        def body(i, c):
            oh = (ids[:, None] == jnp.arange(ncams, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                oh, (v9 * (1 + c[0, 0] * 1e-30)).astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return s
        return body, jnp.zeros((ncams, 9), jnp.float32)

    timed("onehot-matmul (N,9)->cams", mk_onehot, (nobs * 10) * 4)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
