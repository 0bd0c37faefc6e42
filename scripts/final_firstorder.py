"""Gradient-criterion convergence at Final-13682 (VERDICT r4 #7).

Venice-1778 reached first_order in 12 iters / 19.5 s (round 4,
`logs/r4/venice_firstorder.log`).  This runs the same experiment at
Final-13682 with the CHUNKED driver (a single compiled while_loop
dispatch at Final scale exceeds the remote runtime's dispatch limit):
objective-change and step tests disabled, stop on the reference's
first_order criterion (`/root/reference/src/lm.jl:111-123`:
``||J'r|| <= atol + rtol * ||J'r_0||``), full gnorm trajectory recorded.

Usage: python scripts/final_firstorder.py [rtol] [max_iters]
Appends one row to benchmark_results/stats.jsonl (solver
"lm_pcg_cs_bf16w_firstorder").
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bundleadjustment_jl_tpu.ops import pallas_schur  # noqa: E402
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    STATUS_NAMES, levenberg_marquardt_jit_chunked)
from tpu_capacity import _cached_problem  # noqa: E402


def main():
    rtol = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6
    max_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    pallas_schur.set_mode(jax.default_backend() == "tpu")
    problem = _cached_problem("Final", 13682, 4456117, 7)
    problem = jax.device_put(problem)
    float(sum(jnp.sum(x.astype(jnp.float32))
              for x in jax.tree.leaves(problem)))
    chunk_t = []

    def _cb(d):
        chunk_t.append(d["elapsed"])
        print(f"[firstorder]   {d}", flush=True)

    t0 = time.perf_counter()
    res = levenberg_marquardt_jit_chunked(
        problem, max_iters=max_iters, chunk_iters=1, pcg_max_iters=200,
        lam0_mode="diag", satol=0.0, srtol=0.0, oatol=0.0, ortol=0.0,
        atol=0.0, rtol=rtol, facto_dtype="bfloat16", max_time=3600.0,
        callback=_cb)
    wall = time.perf_counter() - t0
    obj = float(res.objective)
    it = int(res.iterations)
    g = np.asarray(res.hist_gnorm)[:it]
    print("gnorm trajectory:")
    for i in range(it):
        print(f"  it{i:3d}  gnorm={g[i]:.4f}", flush=True)
    load_s = None
    if len(chunk_t) >= 3:
        diffs = sorted(b - a for a, b in zip(chunk_t, chunk_t[1:]))
        steady = diffs[len(diffs) // 2]
        load_s = max(chunk_t[0] - steady, 0.0)
    row = {
        "problem": "Final-13682-4456117-synth",
        "solver": "lm_pcg_cs_bf16w_firstorder",
        "status": STATUS_NAMES[int(res.status)],
        "objective": obj,
        "rmse_px": round((2 * obj / (2 * problem.nobs)) ** 0.5, 4),
        "iterations": it,
        "elapsed_s": round(res.elapsed_time - (load_s or 0.0), 2),
        "load_s": None if load_s is None else round(load_s, 1),
        "wall_s": round(wall, 1),
        "dual_feas": float(res.dual_feas),
        "gnorm0": float(g[0]) if it else None,
        "gnorm_min": float(g.min()) if it else None,
        "rtol_gradient": rtol,
        "nvar": problem.nvar, "nequ": 2 * problem.nobs,
        "pallas": True, "cam_scatter": pallas_schur.CAM_SCATTER,
    }
    print(json.dumps(row), flush=True)
    with open("benchmark_results/stats.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
