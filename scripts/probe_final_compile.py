"""AOT compile-probe of the Final-13682 chunked-driver programs.

Lowers `_lm_init` and `_lm_run` at Final shapes from ShapeDtypeStructs
(no 663 MB device transfer, no execution) and compiles them on the
remote TPU — the cheapest way to validate HBM fit after an assembly
layout change (the measured failure mode is a compile-time OOM, e.g.
the 14.9 GB T(8,128) relayout of pt2d, logs/r3b/driver2.log)."""
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
print("nobs", problem.nobs, "ncams", problem.ncams, flush=True)
abstract = jax.tree.map(
    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), problem)
cams, points, hp, static = lm_jit._split_options(
    abstract, None, None, 10, None, "diag",
    0.0, 1e-5, None, 0.0, 0.0, 0.0, 1e-4,
    3.0, 3.0, 1e-4, 0.9, 1e-8, "ref", None, 100,
    False, False, False, False, 4, "bfloat16", False)

t0 = time.perf_counter()
init_c = lm_jit._lm_init.lower(abstract, cams, points, hp,
                               **static).compile()
print("INIT COMPILED", round(time.perf_counter() - t0, 1), "s", flush=True)
print(init_c.memory_analysis(), flush=True)

state = jax.eval_shape(
    lambda p, c, x, h: lm_jit._lm_init_impl(p, c, x, h, **static),
    abstract, cams, points, hp)
state = dict(state, it_max=jax.ShapeDtypeStruct((), jnp.int32))
t0 = time.perf_counter()
run_c = lm_jit._lm_run.lower(abstract, state, hp, **static).compile()
print("RUN COMPILED", round(time.perf_counter() - t0, 1), "s", flush=True)
print(run_c.memory_analysis(), flush=True)
