"""Benchmark: full LM solve on a LadyBug-49-sized synthetic BAL problem.

The reference's headline problem is LadyBug-49-7776 (49 cams, 7776 points,
31,843 observations), solved by its best config (LM + LDL + AMD, Float64) in
54.3 s / 57 iterations on the author's CPU (`BASELINE.md`). No BAL files are
available in this environment (zero egress), so the benchmark generates a
synthetic problem of identical dimensions and solves it end-to-end with the
fully-jitted LM (matrix-free Schur + block-Jacobi PCG) on whatever backend
is available (real TPU chip under the driver; CPU otherwise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` > 1 means faster than the reference's 54.3 s.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_S = 54.3          # LM-LDL F64, LadyBug-49 (BASELINE.md)
MAX_ITERS = 60             # reference used 57 iterations


def main():
    from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
    from bundleadjustment_jl_tpu.solver.lm_jit import (
        STATUS_NAMES, levenberg_marquardt_jit)

    backend = jax.default_backend()
    dtype = jnp.float32  # TPU-native working precision

    def make(seed):
        problem, _ = synthetic_bal(
            ncams=49, npnts=7776, obs_per_pnt=4, noise_px=1.0,
            perturb=3e-2, seed=seed, dtype=dtype, pad_obs_to=512)
        return problem

    # f32 notes: sqrt(eps_f32) step tolerances are meaningless at BAL scale
    # (they would stop at ||d|| < 1e-3 ||x||), so the step test is disabled;
    # convergence = gradient down 1e5x or objective decrease < 0.01%/iter
    # (reaches the statistical optimum of the synthetic problem: with
    # noise 1 px, E[min obj] = 0.5*(nequ - nvar)*sigma^2 ~ 19220 <=>
    # rmse 0.786 px).
    solve = lambda p: levenberg_marquardt_jit(  # noqa: E731
        p, max_iters=MAX_ITERS, pcg_max_iters=100,
        lam0_mode="diag", satol=0.0, srtol=0.0,
        atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4)

    # Warm-up on a same-shape problem: XLA compiles once per shape. NB: on
    # the remote-TPU tunnel backend `block_until_ready` does NOT wait for
    # execution — only a device->host fetch does — so all timing brackets a
    # scalar fetch.
    warm = solve(make(seed=1))
    float(warm.objective)

    problem = make(seed=0)
    t0 = time.perf_counter()
    res = solve(problem)
    obj = float(res.objective)
    elapsed = time.perf_counter() - t0

    nequ = 2 * problem.nobs
    print(json.dumps({
        "metric": "ladybug49_synth_lm_solve",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / elapsed, 2),
        "backend": backend,
        "status": STATUS_NAMES[int(res.status)],
        "iterations": int(res.iterations),
        "objective": obj,
        "rmse_px": round((2.0 * obj / nequ) ** 0.5, 4),
    }))


if __name__ == "__main__":
    main()
