"""Which part of the Final-13682 _lm_run program owns the 412 MB of
generated TPU code?  The first dispatch pays a ~300 s remote executable
load (measured with a persistent-cache HIT: /tmp/final_capd2 — so it is
load, not compile); code size is the lever.  AOT-compile the big
sub-programs at Final shapes and print generated_code_size each.

Usage: python scripts/probe_final_codesize.py [which ...]
  which in: assemble tok gather cg trial run init  (default: all small ones)
"""
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
abstract = jax.tree.map(
    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), problem)
n_pad = problem.nobs_pad
ncams, npnts = problem.ncams, problem.npnts
f32 = jnp.float32
bf16 = jnp.bfloat16


def report(name, jitfn, *avals):
    t0 = time.perf_counter()
    c = jitfn.lower(*avals).compile()
    m = c.memory_analysis()
    print(f"{name:12s} code={m.generated_code_size_in_bytes/1e6:8.1f} MB "
          f"temps={m.temp_size_in_bytes/1e9:6.2f} GB "
          f"compile={time.perf_counter()-t0:6.1f} s", flush=True)


def probe_assemble():
    from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
    def f(p, c, x):
        b = assemble_blocks(p, c, x, with_jr=False, kminor=False,
                            w_dtype=bf16)
        return b.obj, b.W_f, b.g_c_f, b.g_p_f, b.Hcc_f, b.Hpp_f
    report("assemble", jax.jit(f),
           abstract, jax.ShapeDtypeStruct((ncams, 9), f32),
           jax.ShapeDtypeStruct((npnts, 3), f32))


def probe_tok():
    report("to_k_minor", jax.jit(pallas_schur.to_k_minor),
           jax.ShapeDtypeStruct((n_pad * 27,), bf16))


def probe_gather():
    report("gather_kmin", jax.jit(pallas_schur.gather_k_minor),
           jax.ShapeDtypeStruct((32, n_pad), bf16),
           jax.ShapeDtypeStruct((n_pad,), jnp.int32))


def probe_cg():
    from bundleadjustment_jl_tpu.ops.schur import (
        reduce_and_diag, schur_matvec, back_substitute_quad)
    from bundleadjustment_jl_tpu.ops.pcg import (
        pcg, block_jacobi_inverse, block_jacobi_apply)
    from bundleadjustment_jl_tpu.ops.normal import GNBlocks
    def f(p, W_t, W_cam_t, g_c, g_p, Hcc, Hpp, lam):
        blocks = GNBlocks(g_c_f=g_c, g_p_f=g_p, Hcc_f=Hcc, Hpp_f=Hpp,
                          W_f=None, obj=lam, W_t=W_t, W_cam_t=W_cam_t)
        sys_, Sd = reduce_and_diag(p, blocks, lam)
        M_inv = block_jacobi_inverse(Sd)
        res = pcg(lambda v: schur_matvec(sys_, v), sys_.b,
                  lambda v: block_jacobi_apply(M_inv, v),
                  rtol=jnp.float32(1e-2), max_iters=100,
                  stagnation_window=8)
        dp, Jd2 = back_substitute_quad(p, blocks, sys_, res.x)
        return res.x, dp, Jd2
    report("cg_solve", jax.jit(f), abstract,
           jax.ShapeDtypeStruct((32, n_pad), bf16),
           jax.ShapeDtypeStruct((32, n_pad), bf16),
           jax.ShapeDtypeStruct((ncams * 9,), f32),
           jax.ShapeDtypeStruct((npnts * 3,), f32),
           jax.ShapeDtypeStruct((ncams * 81,), f32),
           jax.ShapeDtypeStruct((npnts * 9,), f32),
           jax.ShapeDtypeStruct((), f32))


def probe_trial():
    from bundleadjustment_jl_tpu.ops.residuals import objective_chunked
    def f(p, c, x):
        return objective_chunked(p, c, x, pallas_schur.GATHER_CHUNK)
    report("trial_obj", jax.jit(f), abstract,
           jax.ShapeDtypeStruct((ncams, 9), f32),
           jax.ShapeDtypeStruct((npnts, 3), f32))


PROBES = {"assemble": probe_assemble, "tok": probe_tok,
          "gather": probe_gather, "cg": probe_cg, "trial": probe_trial}

if __name__ == "__main__":
    which = sys.argv[1:] or list(PROBES)
    for w in which:
        PROBES[w]()
