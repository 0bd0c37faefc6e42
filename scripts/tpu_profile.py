"""Per-phase timing of the LM inner ops on the current backend.

Loop-amortized methodology (see scripts/_bench_util.py): every op is timed
as a jitted `lax.fori_loop` chain of N dependent applications bracketed by
a device->host scalar fetch; per-op cost = (t_N - t_1)/(N - 1). The
problem and all derived arrays are passed as JIT ARGUMENTS (closed-over
device arrays become HLO constants -- the methodology bug that produced
half-gigabyte executables and 45-minute compiles in early round-2 runs).

Usage: python scripts/tpu_profile.py [ncams npnts obs_per_pnt N]
Env: BA_PALLAS=1 enables the fused Pallas kernels (ops/pallas_schur.py).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks  # noqa: E402
from bundleadjustment_jl_tpu.ops.pcg import (  # noqa: E402
    block_cho_solve, block_cholesky)
from bundleadjustment_jl_tpu.ops.residuals import objective  # noqa: E402
from bundleadjustment_jl_tpu.ops.schur import (  # noqa: E402
    back_substitute, reduce_system, schur_diag_blocks, schur_matvec)


def timed_chain(name, make_fn, args, n_hi=16, n_lo=1):
    """make_fn(n) -> jitted callable(*args) returning a scalar after n
    dependent applications."""
    f_hi = make_fn(n_hi)
    f_lo = make_fn(n_lo)
    float(f_hi(*args))          # compile + warm
    float(f_lo(*args))
    t0 = time.perf_counter()
    float(f_lo(*args))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f_hi(*args))
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{name:<28} {1e3 * per:10.3f} ms/op   "
          f"(t1={1e3 * t_lo:.1f} ms, t{n_hi}={1e3 * t_hi:.1f} ms)",
          flush=True)
    return per


def main(ncams=318, npnts=41628, obs_per_pnt=4, N=16):
    import os
    kminor = False
    if os.environ.get("BA_PALLAS") == "1":
        from bundleadjustment_jl_tpu.ops import pallas_schur
        pallas_schur.set_mode(True)
        kminor = os.environ.get("BA_KMINOR", "1") == "1"
        print(f"PALLAS_MODE on (kminor assembly={kminor})", flush=True)
    print(f"backend={jax.default_backend()} ncams={ncams} npnts={npnts}",
          flush=True)
    problem, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                               obs_per_pnt=obs_per_pnt, noise_px=1.0,
                               perturb=2e-2, seed=1, dtype=jnp.float32,
                               pad_obs_to=512)
    if kminor:
        from bundleadjustment_jl_tpu.ops import pallas_schur
        kminor = pallas_schur.problem_ok(problem, jnp.float32)
    print(f"nobs={problem.nobs}", flush=True)
    lam = jnp.asarray(1e2, jnp.float32)
    blocks = jax.jit(lambda p: assemble_blocks(
        p, with_jr=False, kminor=kminor))(problem)
    sys_ = jax.jit(reduce_system)(problem, blocks, lam)
    L = jax.jit(lambda s: block_cholesky(schur_diag_blocks(s)))(sys_)

    def chain_assemble(n):
        @jax.jit
        def run(problem):
            def body(i, c):
                b = assemble_blocks(problem, problem.cams + c * 1e-30,
                                    problem.points, with_jr=False,
                                    kminor=kminor)
                return c + jnp.sum(b.g_c) * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    def chain_objective(n):
        @jax.jit
        def run(problem):
            def body(i, c):
                return c + objective(problem, problem.cams + c * 1e-30,
                                     problem.points) * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    def chain_reduce(n):
        @jax.jit
        def run(problem, blocks, lam):
            def body(i, c):
                s = reduce_system(problem, blocks, lam + c * 1e-30)
                return c + jnp.sum(s.b) * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    def chain_matvec(n):
        @jax.jit
        def run(sys_):
            def body(i, v):
                u = schur_matvec(sys_, v)
                return u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
            v = jax.lax.fori_loop(0, n, body, jnp.ones_like(sys_.b))
            return jnp.sum(v)
        return run

    def chain_precond(n):
        @jax.jit
        def run(sys_, L):
            def body(i, v):
                u = block_cho_solve(L, v)
                return u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
            v = jax.lax.fori_loop(0, n, body, jnp.ones_like(sys_.b))
            return jnp.sum(v)
        return run

    def chain_diag(n):
        @jax.jit
        def run(problem, blocks, lam):
            def body(i, c):
                s = reduce_system(problem, blocks, lam + c * 1e-30)
                return c + jnp.sum(schur_diag_blocks(s)) * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    def chain_backsub(n):
        @jax.jit
        def run(sys_):
            def body(i, v):
                dp = back_substitute(sys_, v)
                return v * (1 + jnp.sum(dp) * 1e-30)
            v = jax.lax.fori_loop(0, n, body, jnp.ones_like(sys_.b))
            return jnp.sum(v)
        return run

    t_asm = timed_chain("assemble_blocks", chain_assemble, (problem,))
    t_obj = timed_chain("objective (trial)", chain_objective, (problem,))
    t_red = timed_chain("reduce_system", chain_reduce,
                        (problem, blocks, lam))
    t_dia = timed_chain("reduce+diag_blocks", chain_diag,
                        (problem, blocks, lam))
    t_mv = timed_chain("schur_matvec", chain_matvec, (sys_,), n_hi=4 * N)
    t_pc = timed_chain("precond apply", chain_precond, (sys_, L),
                       n_hi=4 * N)
    t_bs = timed_chain("back_substitute", chain_backsub, (sys_,),
                       n_hi=2 * N)

    cg = 25
    model = t_asm + t_obj + t_dia + t_bs + cg * (t_mv + t_pc)
    print(f"\nmodel LM iter @ {cg} CG its  {1e3 * model:10.3f} ms"
          f"  (reduce {1e3 * t_red:.1f} ms inside diag)", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
