"""Execution bisect at Final-13682: run _lm_init alone, fetch, then one
_lm_run chunk of 1 iteration, fetch. Separates assembly-scan crashes
from run-loop crashes (the async dispatch makes the capacity run's
first fetch blame ambiguous)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from bundleadjustment_jl_tpu.models.problem import BAProblem
from bundleadjustment_jl_tpu.ops import pallas_schur
from bundleadjustment_jl_tpu.solver import lm_jit

pallas_schur.set_mode(True)
z = np.load("Data/synth_cache/Final-13682-4456117-7.npz")
problem = BAProblem.from_arrays(
    z["cams"], z["points"], z["cam_idx"], z["pnt_idx"], z["pt2d"],
    dtype=jnp.float32, pad_obs_to=512, name="Final-13682")
problem = jax.device_put(problem)
float(sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(problem)))
print("problem on device", flush=True)
cams, points, hp, static = lm_jit._split_options(
    problem, None, None, 10, None, "diag",
    0.0, 1e-5, None, 0.0, 0.0, 0.0, 1e-4,
    3.0, 3.0, 1e-4, 0.9, 1e-8, "ref", None, 100,
    False, False, False, False, 4, "bfloat16", False)
t0 = time.perf_counter()
state = lm_jit._lm_init(problem, cams, points, hp, **static)
print("init obj", float(state["obj"]), "gnorm", float(state["gnorm"]),
      f"{time.perf_counter()-t0:.1f}s", flush=True)
state = dict(state, it_max=jnp.asarray(1, jnp.int32))
t0 = time.perf_counter()
state = lm_jit._lm_run(problem, state, hp, **static)
print("iter1 obj", float(state["obj"]), "status", int(state["status"]),
      "cg", int(state["hist_cg"][0]), f"{time.perf_counter()-t0:.1f}s",
      flush=True)

state = dict(state, it_max=jnp.asarray(2, jnp.int32))
t0 = time.perf_counter()
state = lm_jit._lm_run(problem, state, hp, **static)
print("iter2 obj", float(state["obj"]), "status", int(state["status"]),
      "cg", int(state["hist_cg"][1]), f"{time.perf_counter()-t0:.1f}s",
      flush=True)
state = dict(state, it_max=jnp.asarray(4, jnp.int32))
t0 = time.perf_counter()
state = lm_jit._lm_run(problem, state, hp, **static)
print("iter3-4 obj", float(state["obj"]), "status", int(state["status"]),
      f"{time.perf_counter()-t0:.1f}s", flush=True)
