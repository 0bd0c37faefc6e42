"""Mixed-precision cascade solves.

TPU-native heir of the reference's precision experiments
(`/root/reference/src/diffprecsions.jl:17-50`,
`src/benchmark_diffprec.jl:38-94`): solve in a cheap low precision first,
then warm-start progressively higher precisions from the previous solution
(the reference's F16 -> F32 -> F64 cascade with loosened low-precision
tolerances). On TPU the natural ladder is bf16 -> f32 (native MXU/VPU
dtypes) with an optional f64 polish (emulated on TPU, native on CPU).

Unlike the reference — which only lowers the *factorization* precision
inside an F64 outer loop (`lm.jl:99`, `ldl_aux.jl:272-274`) — each cascade
stage here runs the entire solve in the stage dtype; warm-starting carries
the solution across stages exactly like `benchmark_diffprec.jl:46-53`.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from bundleadjustment_jl_tpu.models.problem import BAProblem
from bundleadjustment_jl_tpu.solver.lm_jit import (
    STATUS_NAMES, levenberg_marquardt_jit)

# tolerance loosening per stage, mirroring the reference's looser F16 stage
# (`benchmark_diffprec.jl:44`: atol/rtol multiplied up for low precision)
_DEFAULT_STAGES = ("bfloat16", "float32")


def precision_cascade(problem: BAProblem,
                      stages: Sequence[str] = _DEFAULT_STAGES,
                      max_iters: int = 100, pcg_max_iters: int = 100,
                      **lm_kwargs) -> List[dict]:
    """Run the cascade; returns one stats row per stage.

    The final stage's (cams, points) are returned inside the last row under
    ``"cams"``/``"points"``.
    """
    import time

    cams, points = problem.cams, problem.points
    rows: List[dict] = []
    for stage in stages:
        dtype = jnp.dtype(stage)
        p = problem.astype(dtype)
        c0 = cams.astype(dtype)
        x0 = points.astype(dtype)
        t0 = time.perf_counter()
        res = levenberg_marquardt_jit(
            p, cams=c0, points=x0, max_iters=max_iters,
            pcg_max_iters=pcg_max_iters, **lm_kwargs)
        jax.block_until_ready(res.objective)
        elapsed = time.perf_counter() - t0
        cams, points = res.cams, res.points
        rows.append({
            "stage": stage,
            "status": STATUS_NAMES[int(res.status)],
            "objective": float(res.objective),
            "iterations": int(res.iterations),
            "elapsed_s": elapsed,
            "dual_feas": float(res.dual_feas),
        })
    rows[-1]["cams"] = cams
    rows[-1]["points"] = points
    return rows
