"""Per-phase timing of one LM iteration on the current backend.

Answers "where does the per-iteration time go" (linearize vs Schur reduce
vs preconditioner vs one CG matvec vs trial eval) so kernel optimization
targets the real bottleneck. Usage:
    python scripts/tpu_profile.py [ncams npnts obs_per_pnt reps]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.ops.jacobian import residuals_and_jacobian  # noqa: E402
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks  # noqa: E402
from bundleadjustment_jl_tpu.ops.pcg import (  # noqa: E402
    block_cho_solve, block_cholesky, pcg)
from bundleadjustment_jl_tpu.ops.residuals import objective  # noqa: E402
from bundleadjustment_jl_tpu.ops.schur import (  # noqa: E402
    back_substitute, reduce_system, schur_diag_blocks, schur_matvec)


def bench(name, fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<28} {1e3 * dt:10.3f} ms", flush=True)
    return out, dt


def main(ncams=1031, npnts=110968, obs_per_pnt=5, reps=20):
    print(f"backend={jax.default_backend()} ncams={ncams} npnts={npnts}")
    problem, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                               obs_per_pnt=obs_per_pnt, noise_px=1.0,
                               perturb=2e-2, seed=1, dtype=jnp.float32,
                               pad_obs_to=1024)
    print(f"nobs={problem.nobs}")
    lam = jnp.asarray(1e2, jnp.float32)

    jac = jax.jit(lambda p: residuals_and_jacobian(p))
    bench("residuals+jacobian", jac, problem, reps=reps)

    asm = jax.jit(assemble_blocks)
    blocks, _ = bench("assemble_blocks (full)", asm, problem, reps=reps)

    red = jax.jit(reduce_system)
    sys_, _ = bench("reduce_system", red, problem, blocks, lam, reps=reps)

    diag = jax.jit(schur_diag_blocks)
    D, _ = bench("schur_diag_blocks", diag, sys_, reps=reps)

    chol = jax.jit(block_cholesky)
    L, _ = bench("block_cholesky(9x9)", chol, D, reps=reps)

    mv = jax.jit(schur_matvec)
    v = jnp.ones_like(sys_.b)
    bench("schur_matvec (1 CG it)", mv, sys_, v, reps=reps)

    ps = jax.jit(lambda L, v: block_cho_solve(L, v))
    bench("precond apply", ps, L, v, reps=reps)

    cg20 = jax.jit(lambda s, L: pcg(
        lambda u: schur_matvec(s, u), s.b,
        lambda u: block_cho_solve(L, u), rtol=1e-30, max_iters=20))
    bench("pcg 20 iters", cg20, sys_, L, reps=max(1, reps // 4))

    bs = jax.jit(back_substitute)
    dc = jnp.ones_like(sys_.b)
    bench("back_substitute", bs, sys_, dc, reps=reps)

    obj = jax.jit(objective)
    bench("objective (trial eval)", obj, problem, reps=reps)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
