"""Layout roofline: same logical work, different physical layouts.

Companion to `tpu_roofline.py`. XLA TPU tiles the minor two dims of every
HBM array to (8, 128) f32, so an (N, d) array with small d carries a
128/d-times padding tax on every byte moved. These chains measure the SAME
logical stream/contract in (N, d), flat 1-D, wide-2-D and (d, N) layouts,
plus a pure MXU matmul for the compute roofline. Results drive the layout
strategy (docs/performance.md).

Usage: python scripts/tpu_roofline2.py [nobs N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def chain(fn, carry0, n):
    @jax.jit
    def run():
        return jax.lax.fori_loop(0, n, fn, carry0)
    return run


def timed(name, make, nbytes, n_hi=16, n_lo=1):
    f_hi = chain(*make(), n_hi)
    f_lo = chain(*make(), n_lo)
    for f in (f_hi, f_lo):
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], f())
    t0 = time.perf_counter()
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], f_lo())
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], f_hi())
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{name:<34} {1e3 * per:9.3f} ms  {nbytes / per / 1e9:8.1f} GB/s "
          f"({nbytes / 1e6:.1f} MB/op)", flush=True)
    return per


def main(nobs=1 << 20):
    print(f"backend={jax.default_backend()} nobs={nobs}", flush=True)
    key = jax.random.PRNGKey(0)
    total = nobs * 27
    xflat = jax.random.normal(key, (total,), jnp.float32)
    nbytes = 2 * total * 4

    def mk(x0):
        def body(i, c):
            return c * 1.0000001 + 1e-12
        return lambda: (body, x0)

    timed("stream flat (N*27,)", mk(xflat), nbytes)
    timed("stream (N,27)", mk(xflat.reshape(nobs, 27)), nbytes)
    timed("stream (27,N)", mk(xflat.reshape(27, nobs)), nbytes)
    timed("stream wide (M,4096)", mk(xflat.reshape(-1, 4096)), nbytes)

    # W'v in flat-blockmul form vs transposed (27,N) row-arithmetic form
    W27N = xflat.reshape(27, nobs)
    v9N = jax.random.normal(key, (9, nobs), jnp.float32)
    wv_bytes = (27 + 9 + 3) * nobs * 4

    def mk_wtv_T():
        def body(i, c):
            v = v9N * (1 + c[0, 0] * 1e-30)
            W = W27N.reshape(9, 3, nobs)
            # u[b] = sum_a W[a,b,:] * v[a,:] -- 27 full-lane FMAs
            out = jnp.einsum("abn,an->bn", W, v)
            return out
        return body, jnp.zeros((3, nobs), jnp.float32)

    timed("W'v rows (27,N)x(9,N)->(3,N)", mk_wtv_T, wv_bytes)

    from bundleadjustment_jl_tpu.ops.blockmul import wT_dot_a
    v9 = jnp.swapaxes(v9N, 0, 1).copy()

    def mk_wtv_flat():
        def body(i, c):
            return wT_dot_a(xflat, v9 * (1 + c[0, 0] * 1e-30))
        return body, jnp.zeros((nobs, 3), jnp.float32)

    timed("W'v blockmul flat+(N,d)", mk_wtv_flat, wv_bytes)

    # pure MXU: (4k,4k)@(4k,4k) f32 and bf16
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        A = jax.random.normal(key, (4096, 4096), dt)

        def mk_mm(A=A):
            def body(i, c):
                return jnp.dot(c, A, preferred_element_type=c.dtype)
            return lambda: (body, A)

        t = timed(f"matmul 4096^3 {name}", mk_mm(), 3 * 4096 * 4096 *
                  jnp.dtype(dt).itemsize)
        print(f"    -> {2 * 4096**3 / t / 1e12:.2f} TFLOP/s", flush=True)

    # gather via one-hot MXU matmul: (N,1024table,9)
    ncams = 1024
    table = jax.random.normal(key, (ncams, 9), jnp.float32)
    cam_idx = jax.random.randint(key, (nobs,), 0, ncams)

    def mk_onehot_gather():
        ids = cam_idx.astype(jnp.int32)

        def body(i, c):
            oh = (ids[:, None] == jnp.arange(ncams, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                oh, (table * (1 + c[0, 0] * 1e-30)).astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return g
        return body, jnp.zeros((nobs, 9), jnp.float32)

    timed("gather via onehot matmul", mk_onehot_gather, nobs * 10 * 4)

    # sorted point "gather" via scatter-of-deltas + cumsum: with pnt_idx
    # sorted, t[pnt_idx] == cumsum(scatter(starts, t_delta)) exactly
    # (telescoping); replaces a serialized gather with one small scatter +
    # one prefix sum.
    npnts = nobs // 8
    t_tab = jax.random.normal(key, (npnts, 3), jnp.float32)
    pnt_idx = jnp.sort(jax.random.randint(key, (nobs,), 0, npnts))
    starts = jnp.searchsorted(pnt_idx, jnp.arange(npnts))  # first row of p

    def mk_cumsum_gather():
        def body(i, c):
            t = t_tab * (1 + c[0, 0] * 1e-30)
            delta = t - jnp.concatenate([jnp.zeros((1, 3), t.dtype),
                                         t[:-1]], axis=0)
            seed = jnp.zeros((nobs, 3), t.dtype).at[starts].add(delta)
            return jnp.cumsum(seed, axis=0)
        return body, jnp.zeros((nobs, 3), jnp.float32)

    timed("sorted gather via cumsum-delta", mk_cumsum_gather,
          nobs * 6 * 4)

    def mk_plain_sorted_gather():
        def body(i, c):
            return (t_tab * (1 + c[0, 0] * 1e-30))[pnt_idx]
        return body, jnp.zeros((nobs, 3), jnp.float32)

    timed("sorted gather plain (N,3)", mk_plain_sorted_gather,
          nobs * 6 * 4)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20)
