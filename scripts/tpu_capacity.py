"""Single-chip capacity runs: Venice-1350, Venice-1778, Final-13682.

The reference stalls on Venice-1350 at iteration 1 after 1.9e3 s
(`reference/benchmark/first/lmldlamd_big.log`) and never attempts anything
larger. Round 1 of this framework compiled Venice-1350 single-chip but
crashed at execution (9.9 GB peak — Jc/Jp/r materialization); round 2's
solver keeps only the reduced blocks (`assemble_blocks(with_jr=False)`),
so these runs fit one chip. Final runs use the chunked driver
(checkpoints + wall-clock bound) with bf16 W storage — the configuration
a production Final-scale run would use.

Writes one JSON line per run; also appends to benchmark_results/capacity.jsonl.

Usage: python scripts/tpu_capacity.py [max_nobs]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    STATUS_NAMES, levenberg_marquardt_jit_chunked)

RUNS = [
    # (family, ncams, npnts, obs_per_pnt, max_iters, facto)
    ("Venice", 1350, 894716, 5, 30, None),
    ("Venice", 1778, 993923, 5, 30, None),
    ("Final", 13682, 4456117, 7, 10, "bfloat16"),
]

REF_NOTE = {
    1350: "reference stalls at iter 1 after 1.9e3 s",
    1778: "reference never ran Venice-1778",
    13682: "reference never attempted Final scale",
}


def _cached_problem(family, ncams, npnts, opp):
    """Generate-or-load: capacity attempts run one per OS process (crash
    isolation), so Final-scale generation (~10 min of numpy) is cached
    as raw arrays on disk across attempts."""
    import numpy as np

    from bundleadjustment_jl_tpu.models.problem import BAProblem
    cache = f"Data/synth_cache/{family}-{ncams}-{npnts}-{opp}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return BAProblem.from_arrays(
            z["cams"], z["points"], z["cam_idx"], z["pnt_idx"], z["pt2d"],
            dtype=jnp.float32, pad_obs_to=512,
            name=f"{family}-{ncams}-{npnts}")
    problem, _ = synthetic_bal(
        ncams=ncams, npnts=npnts, obs_per_pnt=opp, noise_px=1.0,
        perturb=2e-2, seed=ncams, dtype=jnp.float32, pad_obs_to=512)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    n = problem.nobs
    np.savez(cache, cams=np.asarray(problem.cams),
             points=np.asarray(problem.points),
             cam_idx=np.asarray(problem.cam_idx[:n]),
             pnt_idx=np.asarray(problem.pnt_idx[:n]),
             pt2d=np.asarray(problem.pt2d[:n]))
    return problem


def main(max_nobs=40_000_000, only=None):
    """``only``: run a single RUNS index — one OS process per attempt, so
    a TPU-worker crash on one problem cannot poison the next (the runtime
    offers no in-process recovery after `UNAVAILABLE: worker crashed`)."""
    out_path = "benchmark_results/capacity.jsonl"
    os.makedirs("benchmark_results", exist_ok=True)
    use_pallas = os.environ.get("BA_PALLAS", "1") != "0"
    if use_pallas:
        from bundleadjustment_jl_tpu.ops import pallas_schur
        pallas_schur.set_mode(True)
    print(f"backend={jax.default_backend()} pallas={use_pallas}",
          flush=True)
    for i, (family, ncams, npnts, opp, max_iters, facto) in enumerate(RUNS):
        if only is not None and i != only:
            continue
        if npnts * opp > max_nobs:
            continue
        t0 = time.perf_counter()
        problem = _cached_problem(family, ncams, npnts, opp)
        gen_s = time.perf_counter() - t0
        print(f"[capacity] {family}-{ncams}: nobs={problem.nobs} "
              f"gen {gen_s:.0f}s", flush=True)
        # Transfer + true barrier BEFORE the solve: interleaving the
        # ~700 MB host->device transfer with the first dispatch has
        # crashed the experimental runtime at Final scale, and the
        # reference times with the model already resident anyway.
        problem = jax.device_put(problem)
        float(sum(jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree.leaves(problem)))
        solve_kwargs = dict(
            max_iters=max_iters,
            chunk_iters=1 if problem.nobs > 10_000_000 else 3,
            pcg_max_iters=100, lam0_mode="diag",
            satol=0.0, srtol=0.0, atol=0.0, rtol=1e-5,
            oatol=0.0, ortol=1e-4, facto_dtype=facto)
        # load_s: the first dispatch of each compiled program pays a
        # ~280-330 s remote executable load on this tunnel EVEN ON a
        # persistent-cache hit (measured logs/r4/final_capd2: 315 s
        # first chunk vs 31 s steady). A separate warm solve would
        # leave the HBM fragmented for the timed one (measured
        # RESOURCE_EXHAUSTED at Final, final_capacity_r4_relin3.log),
        # so the split is derived from per-chunk timestamps instead:
        # load_s = first-chunk wall minus the median steady chunk.
        # bench.py / the campaign warm up out-of-band the same way the
        # reference times with the model already in RAM
        # (`benchmark.jl:57`); solve_s below excludes load_s.
        chunk_t = []

        def _cb(d):
            chunk_t.append(d["elapsed"])
            print(f"[capacity]   {d}", flush=True)

        t0 = time.perf_counter()
        try:
            res = levenberg_marquardt_jit_chunked(
                # Final-scale dispatches run ~25-50 s/iteration; a 5-iter
                # chunk (>2 min in one device dispatch) reproducibly
                # crashes the experimental remote runtime while 1-2 iter
                # dispatches complete (logs/r3c/, probe_final_exec2).
                # One iteration per dispatch keeps each under the limit.
                problem, **solve_kwargs, max_time=3600.0, callback=_cb)
            obj = float(res.objective)
            load_s = None
            if len(chunk_t) >= 3:
                diffs = sorted(b - a for a, b in zip(chunk_t, chunk_t[1:]))
                steady = diffs[len(diffs) // 2]
                load_s = max(chunk_t[0] - steady, 0.0)
            wall = time.perf_counter() - t0
            row = {
                "problem": f"{family}-{ncams}-{npnts}",
                "nobs": problem.nobs, "nvar": problem.nvar,
                "gen_s": round(gen_s, 1),
                "wall_s": round(wall, 1),
                "solve_s": round(res.elapsed_time
                                 - (load_s or 0.0), 1),
                "iters": int(res.iterations),
                "status": STATUS_NAMES[int(res.status)],
                "objective": obj,
                "rmse_px": round((2 * obj / (2 * problem.nobs)) ** 0.5, 4),
                "expected_obj": round(
                    0.5 * (2 * problem.nobs - problem.nvar), 0),
                "facto_dtype": facto, "chip": "single",
                "load_s": None if load_s is None else round(load_s, 1),
                "pallas": use_pallas,
                "ref_note": REF_NOTE.get(ncams, ""),
            }
        except Exception as e:
            import traceback
            traceback.print_exc()
            msg = repr(e)
            # The tunnel wraps real XLA/Mosaic errors in an HTTP 500
            # boilerplate; keep the informative tail too.
            key = next((ln for ln in msg.splitlines()
                        if "error:" in ln.lower() or "Mosaic" in ln
                        or "RESOURCE_EXHAUSTED" in ln), "")
            row = {"problem": f"{family}-{ncams}-{npnts}",
                   "nobs": problem.nobs, "error": msg[:300],
                   "error_detail": key[:500],
                   "wall_s": round(time.perf_counter() - t0, 1)}
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        del problem


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("max_nobs", nargs="?", type=int, default=40_000_000)
    ap.add_argument("--only", type=int, default=None,
                    help="run a single RUNS index (process isolation)")
    a = ap.parse_args()
    main(a.max_nobs, a.only)
