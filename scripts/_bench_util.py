"""Loop-amortized timing harness for TPU micro-benchmarks.

METHODOLOGY (both rules measured-load-bearing):

1. All device arrays are passed as JIT ARGUMENTS, never closed over —
   closed-over jnp arrays become HLO *constants*, which on the remote
   backend produced 400-560 MB serialized executables, 45-minute compiles
   and meaningless timings (the round-2 postmortem of the first
   tpu_roofline.py run).
2. The remote tunnel's `block_until_ready` returns before execution
   completes, so each measurement brackets a device->host scalar fetch;
   per-op cost = (t_N - t_1)/(N - 1) cancels the fetch/dispatch constant.

`fn(c, *ops)` must make the carry depend on the op result so the chain
serializes.
"""

import time

import numpy as np

import jax


def chain(fn, n):
    @jax.jit
    def run(carry0, *ops):
        return jax.lax.fori_loop(0, n, lambda i, c: fn(c, *ops), carry0)
    return run


def _fetch(x):
    return jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[0], x)


def timed(name, fn, carry0, ops, nbytes, n_hi=16, n_lo=1):
    f_hi = chain(fn, n_hi)
    f_lo = chain(fn, n_lo)
    _fetch(f_hi(carry0, *ops))
    _fetch(f_lo(carry0, *ops))
    t0 = time.perf_counter()
    _fetch(f_lo(carry0, *ops))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fetch(f_hi(carry0, *ops))
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{name:<34} {1e3 * per:9.3f} ms  {nbytes / per / 1e9:8.1f} GB/s "
          f"({nbytes / 1e6:.1f} MB/op)", flush=True)
    return per
