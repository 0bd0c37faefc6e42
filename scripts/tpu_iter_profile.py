"""End-to-end on-device profile of the full LM solve (VERDICT r2 #2).

The per-op A/B harnesses (`tpu_abtest.py`, `tpu_mv_sweep.py`) measure
stages in isolation; this script traces the REAL compiled while-loop with
`jax.profiler.trace` and aggregates the XLA-Ops timeline by op, so the
gap between "sum of measured stage times" and the end-to-end iteration
time is attributed, not guessed (the reference logs per-iteration facto
time the same spirit, `/root/reference/src/lm.jl:160-185`).

Usage:  python scripts/tpu_iter_profile.py [ncams npnts obs_per_pnt]
Env:    BA_CAM_SCATTER=0 to profile the gathered layout instead.
Output: per-op table (device-time, %), a stage-bucket rollup, and the
        device-busy vs wall-clock accounting of the traced solve.
"""

import collections
import glob
import gzip
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
from bundleadjustment_jl_tpu.ops import pallas_schur  # noqa: E402
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    levenberg_marquardt_jit)

TRACE_DIR = "/tmp/ba_iter_trace"

# Stage buckets: substring -> label. Checked in order; first match wins.
BUCKETS = [
    ("assemble", "assembly (per accept)"),
    ("linearize", "assembly (per accept)"),
    ("objective_scatter", "trial objectives"),
    ("matvec", "PCG matvec"),
    ("cam_scatter", "cam-scatter reduce"),
    ("wtv", "point reduce"),
    ("wt_cam", "cam reduce"),
    ("wcw", "schur diag"),
    ("cholesky", "block cholesky"),
    ("triangular", "block cholesky"),
    ("dynamic-update", "history/state"),
    ("copy", "copies"),
    ("fusion", "XLA fusions (misc)"),
]


def bucket(name: str) -> str:
    low = name.lower()
    for pat, label in BUCKETS:
        if pat in low:
            return label
    return "other"


FACTO = {"bf16": "bfloat16", "f16": "float16"}.get(
    os.environ.get("BA_PROFILE_FACTO", ""), None)


def solve(problem):
    return levenberg_marquardt_jit(
        problem, max_iters=100, pcg_max_iters=100, lam0_mode="diag",
        satol=0.0, srtol=0.0, atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4,
        facto_dtype=FACTO)


def main(ncams=356, npnts=226730, obs_per_pnt=6):
    backend = jax.default_backend()
    print(f"backend={backend}", flush=True)
    pallas_schur.set_mode(backend == "tpu")
    pallas_schur.CAM_SCATTER = os.environ.get("BA_CAM_SCATTER", "1") == "1"
    print(f"pallas={pallas_schur.PALLAS_MODE} "
          f"cam_scatter={pallas_schur.CAM_SCATTER}", flush=True)

    warm, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                            obs_per_pnt=obs_per_pnt, noise_px=1.0,
                            perturb=2e-2, seed=1, dtype=jnp.float32,
                            pad_obs_to=512)
    res = solve(warm)
    print(f"warm solve: it={int(res.iterations)} "
          f"obj={float(res.objective):.4g}", flush=True)

    problem, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                               obs_per_pnt=obs_per_pnt, noise_px=1.0,
                               perturb=2e-2, seed=0, dtype=jnp.float32,
                               pad_obs_to=512)
    os.system(f"rm -rf {TRACE_DIR}")
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        res = solve(problem)
        obj = float(res.objective)
    wall = time.perf_counter() - t0
    iters = int(res.iterations)
    cg = int(jnp.sum(res.hist_cg))
    naccepts = int(res.naccepts)
    print(f"traced solve: {wall:.3f} s, it={iters}, accepts={naccepts}, "
          f"cg_matvecs={cg}, obj={obj:.6g}", flush=True)

    traces = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz",
                              recursive=True))
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]

    # device pid + "XLA Ops" tid
    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"
               and e["pid"] in dev_pids}

    per_op = collections.Counter()
    count = collections.Counter()
    t_min, t_max = float("inf"), 0.0
    busy = 0.0
    for e in ev:
        if (e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids
                and "dur" in e):
            per_op[e["name"]] += e["dur"]
            count[e["name"]] += 1
            busy += e["dur"]
            t_min = min(t_min, e["ts"])
            t_max = max(t_max, e["ts"] + e["dur"])
    span = (t_max - t_min) / 1e6 if t_max > t_min else float("nan")
    print(f"\ndevice busy: {busy / 1e6:.3f} s over span {span:.3f} s "
          f"({100 * busy / 1e6 / span:.1f}% duty) — wall {wall:.3f} s")
    print(f"per-iter: wall {1e3 * wall / max(iters, 1):.1f} ms, "
          f"device-busy {1e3 * busy / 1e6 / max(iters, 1):.1f} ms")

    print(f"\n{'op':<72} {'ms':>9} {'%busy':>6} {'count':>6}")
    for name, dur in per_op.most_common(45):
        print(f"{name[:72]:<72} {dur / 1e3:9.2f} {100 * dur / busy:6.2f} "
              f"{count[name]:6d}")

    roll = collections.Counter()
    for name, dur in per_op.items():
        roll[bucket(name)] += dur
    print(f"\n{'stage bucket':<28} {'ms':>9} {'%busy':>6} {'ms/iter':>8}")
    for label, dur in roll.most_common():
        print(f"{label:<28} {dur / 1e3:9.2f} {100 * dur / busy:6.2f} "
              f"{dur / 1e3 / max(iters, 1):8.2f}")


if __name__ == "__main__":
    main(*map(int, sys.argv[1:]))
