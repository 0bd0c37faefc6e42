"""Benchmark campaign driver (the reference's `julia src/benchmark.jl` /
`benchmark_diffprec.jl` role): run the solver matrix over the problem
suite, write Markdown + LaTeX tables, JSONL stats and performance-profile
plots under benchmark_results/.

Usage:
    python scripts/run_benchmark.py [--max-nobs 400000] [--data-dir Data]
                                    [--out benchmark_results] [--diffprec]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-nobs", type=int, default=400_000)
    ap.add_argument("--data-dir", default=None,
                    help="real BAL files (default: synthetic suite)")
    ap.add_argument("--out", default="benchmark_results")
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--diffprec", action="store_true",
                    help="also run the mixed-precision cascade study")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bundleadjustment_jl_tpu.benchmark.precision import precision_cascade
    from bundleadjustment_jl_tpu.benchmark.problems import (
        bal_suite, synthetic_suite)
    from bundleadjustment_jl_tpu.benchmark.runner import (
        latex_table, markdown_table, performance_profile, run_campaign,
        save_stats)
    from bundleadjustment_jl_tpu.solver.lm_jit import (
        STATUS_NAMES, levenberg_marquardt_jit)

    os.makedirs(args.out, exist_ok=True)
    backend = jax.default_backend()
    dtype = jnp.float64 if backend == "cpu" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    common = dict(max_iters=args.max_iters, lam0_mode="diag",
                  satol=0.0, srtol=0.0, atol=0.0, rtol=1e-5,
                  oatol=0.0, ortol=1e-4)

    def timed(fn):
        import time

        def wrapped(problem):
            t0 = time.perf_counter()
            res = fn(problem)
            obj = float(res.objective)       # true barrier on remote TPU
            elapsed = time.perf_counter() - t0

            class R:  # adapt LMJitResult to the campaign row protocol
                status = STATUS_NAMES[int(res.status)]
                objective = obj
                iterations = int(res.iterations)
                elapsed_time = elapsed
                dual_feas = float(res.dual_feas)
            return R
        return wrapped

    solvers = {
        "lm_pcg": timed(lambda p: levenberg_marquardt_jit(
            p, pcg_max_iters=100, **common)),
        "lm_pcg_ls": timed(lambda p: levenberg_marquardt_jit(
            p, pcg_max_iters=100, linesearch=True, **common)),
        "lm_pcg_nielsen": timed(lambda p: levenberg_marquardt_jit(
            p, pcg_max_iters=100, lam_strategy="nielsen", **common)),
    }

    if args.data_dir:
        problems = bal_suite(args.data_dir, dtype=dtype)
    else:
        problems = synthetic_suite(max_nobs=args.max_nobs, dtype=dtype)

    rows = run_campaign(solvers, problems)
    save_stats(rows, os.path.join(args.out, "stats.jsonl"))
    with open(os.path.join(args.out, "tables.md"), "w") as f:
        f.write(markdown_table(rows) + "\n")
    with open(os.path.join(args.out, "tables.tex"), "w") as f:
        f.write(latex_table(rows) + "\n")
    for cost in ("elapsed_s", "iterations"):
        performance_profile(
            rows, cost, out_path=os.path.join(args.out, f"profile_{cost}.pdf"))
    print(f"wrote {args.out}/{{stats.jsonl,tables.md,tables.tex,"
          f"profile_*.pdf}}")

    if args.diffprec:
        drows = []
        if args.data_dir:
            problems = bal_suite(args.data_dir, dtype=jnp.float32)
        else:
            problems = synthetic_suite(max_nobs=args.max_nobs,
                                       dtype=jnp.float32)
        for name, problem in problems:
            rows_ = precision_cascade(
                problem, stages=("bfloat16", "float32"),
                max_iters=args.max_iters, lam0_mode="diag",
                satol=0.0, srtol=0.0)
            for r in rows_:
                r.pop("cams", None)
                r.pop("points", None)
                drows.append({"problem": name, **r})
                print(f"[diffprec] {name} {r['stage']}: {r['status']} "
                      f"obj={r['objective']:.6g} t={r['elapsed_s']:.2f}s")
        save_stats(drows, os.path.join(args.out, "diffprec.jsonl"))


if __name__ == "__main__":
    main()
