"""A/B end-to-end solver timings on the current backend.

Compares, at one problem size, the configurations that matter for the
performance narrative (docs/performance.md):

  native       baseline (XLA gathers)
  gatherfree   one-hot/cumsum row indexing (ops/gatherfree.py)
  bf16facto    native + bf16 factorization storage
  gf+bf16      both
  pallas       fused Pallas Schur kernels (ops/pallas_schur.py)
  pallas+bf16  fused kernels streaming bf16 W storage

Prints per-config solve seconds (second run, compiled executable cached)
and per-iteration ms. Usage:
    python scripts/tpu_abtest.py [ncams npnts obs_per_pnt]
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

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.ops import gatherfree, pallas_schur  # noqa: E402
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    STATUS_NAMES, levenberg_marquardt_jit)


def main(ncams=318, npnts=41628, obs_per_pnt=4):
    print(f"backend={jax.default_backend()} ncams={ncams} npnts={npnts}",
          flush=True)
    problem, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                               obs_per_pnt=obs_per_pnt, noise_px=1.0,
                               perturb=2e-2, seed=ncams, dtype=jnp.float32,
                               pad_obs_to=1024)
    print(f"nobs={problem.nobs}", flush=True)
    opts = dict(max_iters=100, pcg_max_iters=100, lam0_mode="diag",
                satol=0.0, srtol=0.0, atol=0.0, rtol=1e-5,
                oatol=0.0, ortol=1e-4)

    configs = [
        ("native", "native", None),
        ("gatherfree", "gatherfree", None),
        ("bf16facto", "native", jnp.bfloat16),
        ("gf+bf16", "gatherfree", jnp.bfloat16),
        ("pallas", "native", None),
        ("pallas+bf16", "native", jnp.bfloat16),
    ]
    for name, mode, fd in configs:
        gatherfree.set_mode(mode)
        pallas_schur.set_mode(name.startswith("pallas"))
        try:
            t0 = time.perf_counter()
            res = levenberg_marquardt_jit(problem, facto_dtype=fd, **opts)
            float(res.objective)
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = levenberg_marquardt_jit(problem, facto_dtype=fd, **opts)
            obj = float(res.objective)
            solve = time.perf_counter() - t0
            it = int(res.iterations)
            print(json.dumps({
                "config": name, "solve_s": round(solve, 3),
                "compile_s": round(first - solve, 1),
                "per_iter_ms": round(1e3 * solve / max(it, 1), 1),
                "iters": it, "cg_total": int(jnp.sum(res.hist_cg)),
                "status": STATUS_NAMES[int(res.status)],
                "objective": round(obj, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)
    gatherfree.set_mode("native")
    pallas_schur.set_mode(False)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
