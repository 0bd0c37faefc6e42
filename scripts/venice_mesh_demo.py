"""Venice-1350-scale multi-device demonstration.

The reference STALLS on Venice-1350 (894,716 points, 4.5M observations:
small_step at iteration 1 after 1.9e3 s — BASELINE.md); single-chip f32
needs the k-minor layout work (docs/performance.md). This script runs the
problem on a device MESH — the designed scale-out path — sharding the
observation axis. On a real pod slice the same code runs unchanged; here it
validates on N virtual CPU devices.

Usage: python scripts/venice_mesh_demo.py [ndev] [max_iters]
"""

import os
import sys
import time

ndev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
max_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={ndev}").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, shard_problem)
from bundleadjustment_jl_tpu.solver.lm_jit import (  # noqa: E402
    STATUS_NAMES, levenberg_marquardt_jit)


def main():
    print(f"devices: {len(jax.devices())}", flush=True)
    t0 = time.perf_counter()
    problem, _ = synthetic_bal(
        ncams=1350, npnts=894716, obs_per_pnt=5, noise_px=1.0,
        perturb=2e-2, seed=1, dtype=jnp.float32, pad_obs_to=8192)
    print(f"generated Venice-1350 synth: nobs={problem.nobs} "
          f"nvar={problem.nvar} nequ={problem.nequ} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
    sharded = shard_problem(problem, make_mesh(ndev))

    t0 = time.perf_counter()
    res = levenberg_marquardt_jit(
        sharded, max_iters=max_iters, pcg_max_iters=30,
        lam0_mode="diag", satol=0.0, srtol=0.0,
        atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4)
    obj = float(res.objective)
    dt = time.perf_counter() - t0
    nequ = problem.nequ
    print(f"status={STATUS_NAMES[int(res.status)]} iters={int(res.iterations)} "
          f"obj={obj:.6g} rmse={ (2*obj/nequ)**0.5:.4f}px "
          f"expected_opt_obj={0.5*(nequ-problem.nvar):.4g} "
          f"wall={dt:.1f}s (compile included)", flush=True)
    import numpy as np
    print("obj trace:", np.asarray(res.hist_obj[:int(res.iterations)]),
          flush=True)


if __name__ == "__main__":
    main()
