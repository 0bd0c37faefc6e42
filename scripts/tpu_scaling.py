"""Scaling study on real TPU: solve synthetic problems at BAL benchmark
sizes, report wall time / iterations / per-iteration cost vs the reference's
CPU numbers (BASELINE.md). Usage: python scripts/tpu_scaling.py [max_nobs]
"""

import json
import sys
import time

import jax

# Persistent XLA compile cache: remote-TPU compiles run minutes per shape;
# cached executables load in seconds (safe no-op on CPU).
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

sys.path.insert(0, ".")

from bundleadjustment_jl_tpu.benchmark.problems import BAL_SIZES  # noqa: E402
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    STATUS_NAMES, levenberg_marquardt_jit)

# reference LM-LDL F64 wall seconds (BASELINE.md)
REF_S = {49: 54.3, 73: 23.9, 138: 339.7, 318: 231.6, 460: 830.0, 646: 582.3,
         810: 1284.5, 1031: 2817.5, 202: 319.8, 356: 1200.0, 427: 1700.0,
         1350: 1900.0}


def main(max_nobs=5_000_000):
    print(f"backend={jax.default_backend()}")
    for family, ncams, npnts, nobs in BAL_SIZES:
        if nobs > max_nobs:
            continue
        obs_per_pnt = max(2, round(nobs / npnts))
        t0 = time.perf_counter()
        problem, _ = synthetic_bal(
            ncams=ncams, npnts=npnts, obs_per_pnt=obs_per_pnt,
            noise_px=1.0, perturb=2e-2, seed=ncams,
            dtype=jnp.float32, pad_obs_to=512)
        gen_s = time.perf_counter() - t0

        solve = lambda p: levenberg_marquardt_jit(  # noqa: E731
            p, max_iters=100, pcg_max_iters=100, lam0_mode="diag",
            satol=0.0, srtol=0.0, atol=0.0, rtol=1e-5,
            oatol=0.0, ortol=1e-4)
        # NB: on the remote-TPU tunnel `block_until_ready` returns before
        # execution finishes; only a device->host fetch is a true barrier.
        t0 = time.perf_counter()
        res = solve(problem)
        float(res.objective)
        compile_and_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = solve(problem)
        float(res.objective)
        solve_s = time.perf_counter() - t0

        nequ = 2 * problem.nobs
        it = int(res.iterations)
        obj = float(res.objective)
        exp_obj = 0.5 * (nequ - problem.nvar)
        print(json.dumps({
            "problem": f"{family}-{ncams}-{npnts}", "nobs": problem.nobs,
            "gen_s": round(gen_s, 2),
            "compile_s": round(compile_and_first - solve_s, 2),
            "solve_s": round(solve_s, 4),
            "per_iter_ms": round(1e3 * solve_s / max(it, 1), 3),
            "iters": it, "status": STATUS_NAMES[int(res.status)],
            "objective": obj, "rmse_px": round((2 * obj / nequ) ** 0.5, 4),
            "expected_obj": round(exp_obj, 0),
            "cg_total": int(jnp.sum(res.hist_cg)),
            "ref_s": REF_S.get(ncams),
            "speedup": (round(REF_S[ncams] / solve_s, 1)
                        if ncams in REF_S else None),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000)
