"""Venice-scale solver matrix: lm_pcg x {±cam-scatter} x {±bf16 facto}
x {±linesearch} on synthetic Venice-1350 and Venice-1778.

The round-2 campaign stopped its full matrix at Dubrovnik-356, so the
configuration trade-offs were unmeasured exactly where they matter most
(the reference stalls at Venice-1350 iteration 1 and never ran 1778 —
`/root/reference/benchmark/first/lmldlamd_big.log`). Rows append to
`benchmark_results/stats.jsonl` in the campaign schema, compile time
separated the same way (first call = compile+run, second = run).

Usage: python scripts/venice_matrix.py [--only K] [--skip-existing]
(one config per OS process via --only for crash isolation, like
tpu_capacity.py).
"""

import argparse
import itertools
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.ops import pallas_schur  # noqa: E402
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    STATUS_NAMES, levenberg_marquardt_jit)

PROBLEMS = [("Venice", 1350, 894716, 5), ("Venice", 1778, 993923, 5),
            # Trafalgar-257: dense covisibility (≈880 obs/camera, low
            # npnts/ncams) — the regime stressing the camera-scatter
            # accumulator hardest (BASELINE.md north-star; the reference
            # downloads Trafalgar but never ran it).
            ("Trafalgar", 257, 65132, 3)]
OUT = "benchmark_results/stats.jsonl"


def configs():
    out = []
    for cam_scatter, bf16, ls in itertools.product(
            (True, False), (False, True), (False, True)):
        name = "lm_pcg"
        if cam_scatter:
            name += "_cs"
        if bf16:
            name += "_bf16w"
        if ls:
            name += "_ls"
        out.append((name, cam_scatter, bf16, ls))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=int, default=None,
                    help="single (problem, config) index")
    ap.add_argument("--skip-existing", action="store_true")
    ap.add_argument("--problems", type=str, default="0,1,2",
                    help="comma list of PROBLEMS indices")
    ap.add_argument("--cam-window", type=float, default=None,
                    help="covisibility-locality window (synthetic_bal "
                         "cam_window); same shapes as the uniform problem "
                         "so the compiled executables are reused. Rows get "
                         "a -locW problem-name suffix.")
    a = ap.parse_args()

    pallas_schur.set_mode(jax.default_backend() == "tpu")
    done = set()
    if a.skip_existing and os.path.exists(OUT):
        for line in open(OUT):
            r = json.loads(line)
            if "error" not in r:
                done.add((r.get("problem"), r.get("solver")))

    pidx = [int(x) for x in a.problems.split(",")]
    jobs = [(p, c) for p in pidx for c in range(len(configs()))]
    for k, (pi, ci) in enumerate(jobs):
        if a.only is not None and k != a.only:
            continue
        family, ncams, npnts, opp = PROBLEMS[pi]
        name, cam_scatter, bf16, ls = configs()[ci]
        pname = f"{family}-{ncams}-{npnts}-synth"
        if a.cam_window is not None:
            pname += f"-loc{a.cam_window:g}"
        if (pname, name) in done:
            print(f"[skip] {pname} {name}", flush=True)
            continue
        pallas_schur.CAM_SCATTER = cam_scatter
        problem, _ = synthetic_bal(
            ncams=ncams, npnts=npnts, obs_per_pnt=opp, noise_px=1.0,
            perturb=2e-2, seed=ncams, dtype=jnp.float32, pad_obs_to=512,
            name=pname, cam_window=a.cam_window)
        problem = jax.device_put(problem)
        float(sum(jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree.leaves(problem)))
        kw = dict(max_iters=100, pcg_max_iters=100, lam0_mode="diag",
                  satol=0.0, srtol=0.0, atol=0.0, rtol=1e-5,
                  oatol=0.0, ortol=1e-4, linesearch=ls,
                  facto_dtype="bfloat16" if bf16 else None)
        print(f"[venice_matrix] {pname} {name}", flush=True)
        try:
            def once():
                t0 = time.perf_counter()
                r = levenberg_marquardt_jit(problem, **kw)
                obj = float(r.objective)
                return r, obj, time.perf_counter() - t0
            r, obj, t1 = once()
            r, obj, t2 = once()
            row = {
                "problem": pname, "solver": name,
                "status": STATUS_NAMES[int(r.status)],
                "objective": obj,
                "rmse_px": (2 * obj / (2 * problem.nobs)) ** 0.5,
                "iterations": int(r.iterations),
                "elapsed_s": t2, "compile_s": max(t1 - t2, 0.0),
                "neval_residual": r.neval_residual,
                "neval_jac": r.neval_jac,
                "dual_feas": float(r.dual_feas),
                "nvar": problem.nvar, "nequ": problem.nequ,
                "cg_matvecs": int(jnp.sum(r.hist_cg)),
            }
        except Exception as e:  # noqa: BLE001 — exception ROW, like the ref
            import traceback
            traceback.print_exc()
            row = {"problem": pname, "solver": name,
                   "error": repr(e)[:300]}
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        del problem


if __name__ == "__main__":
    main()
