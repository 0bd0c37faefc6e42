"""On-device attribution of the Final-13682 per-iteration cost.

The capacity run (`tpu_capacity.py`, chunked driver, 1 LM iteration per
dispatch) measures ~33 s/iteration wall — far above the first-order HBM
traffic model (~3 GB of bf16 W per matvec).  This script replays the
EXACT capacity configuration (same compiled programs -> compile-cache
hits) for a couple of iterations under `jax.profiler.trace` and reports
per-op EXCLUSIVE device time: trace events nest (while > body > ops), so
flat sums double-count; here each event's children are subtracted via an
interval stack per device thread.

Usage: python scripts/tpu_final_profile.py [max_time_s]
       (default 80 s of traced solving ~= 2 Final iterations + init)
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

from bundleadjustment_jl_tpu.ops import pallas_schur  # noqa: E402
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    levenberg_marquardt_jit_chunked)
from scripts.tpu_capacity import _cached_problem  # noqa: E402

TRACE_DIR = "/tmp/ba_final_trace"


def solve(problem, max_time):
    return levenberg_marquardt_jit_chunked(
        problem, max_iters=10, chunk_iters=1, max_time=max_time,
        pcg_max_iters=100, lam0_mode="diag",
        satol=0.0, srtol=0.0, atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4,
        facto_dtype="bfloat16",
        callback=lambda d: print(f"[chunk] {d}", flush=True))


def exclusive_times(events, op_tids):
    """Per-op exclusive (self) device time in us; nested XLA-Ops events
    have their children's duration subtracted via a per-thread stack."""
    per_tid = collections.defaultdict(list)
    for e in events:
        if (e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids
                and "dur" in e):
            per_tid[(e["pid"], e["tid"])].append(e)
    excl = collections.Counter()
    count = collections.Counter()
    total_span = 0.0
    for evs in per_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (name, end_ts, child_dur)
        for e in evs:
            ts, dur, name = e["ts"], e["dur"], e["name"]
            while stack and ts >= stack[-1][1]:
                n, _, child = stack.pop()
                excl[n] += -child  # child already subtracted below
            if stack:
                # e is a child of stack[-1]
                stack[-1] = (stack[-1][0], stack[-1][1],
                             stack[-1][2] + dur)
            else:
                total_span += dur
            excl[name] += dur
            count[name] += 1
            stack.append((name, ts + dur, 0.0))
        while stack:
            n, _, child = stack.pop()
            excl[n] += -child
    return excl, count, total_span


def main(max_time=80.0):
    backend = jax.default_backend()
    print(f"backend={backend}", flush=True)
    pallas_schur.set_mode(backend == "tpu")

    problem = _cached_problem("Final", 13682, 4456117, 7)
    problem = jax.device_put(problem)
    float(sum(jnp.sum(x.astype(jnp.float32))
              for x in jax.tree.leaves(problem)))
    print(f"nobs={problem.nobs}", flush=True)

    # Warm pass: compile-cache loads + first dispatch of every program.
    # max_time must cover ONE _lm_run chunk: the first dispatch pays the
    # remote executable load (~300 s for the 412 MB Final program,
    # logs/r4/final_capd2 — cache HIT, still 315 s) — with max_time=1.0
    # the driver stops after init and _lm_run stays cold, so the traced
    # pass would capture the load instead of steady-state iterations.
    t0 = time.perf_counter()
    res = solve(problem, max_time=450.0)
    print(f"warm: {time.perf_counter() - t0:.1f} s, "
          f"it={int(res.iterations)} obj={float(res.objective):.6g}",
          flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        res = solve(problem, max_time=max_time)
        obj = float(res.objective)
    wall = time.perf_counter() - t0
    iters = int(res.iterations)
    print(f"traced: {wall:.1f} s, it={iters}, "
          f"cg={int(jnp.sum(res.hist_cg))}, obj={obj:.6g}", flush=True)

    traces = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz",
                              recursive=True))
    print(f"trace file: {traces[-1]} "
          f"({os.path.getsize(traces[-1]) / 1e6:.1f} MB)", flush=True)
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]

    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"
               and e["pid"] in dev_pids}

    excl, count, busy = exclusive_times(ev, op_tids)
    print(f"\ndevice busy (top-level sum): {busy / 1e6:.2f} s "
          f"over wall {wall:.1f} s; per-iter device "
          f"{busy / 1e6 / max(iters, 1):.2f} s", flush=True)

    print(f"\n{'op (exclusive)':<84} {'ms':>10} {'%':>6} {'count':>7}")
    for name, dur in excl.most_common(60):
        print(f"{name[:84]:<84} {dur / 1e3:10.1f} "
              f"{100 * dur / busy:6.2f} {count[name]:7d}")


if __name__ == "__main__":
    main(*map(float, sys.argv[1:]))
