"""Per-stage timing of the non-matvec LM iteration components at
Dubrovnik-356 shapes (round-5 roofline attribution): reduce_and_diag,
block-Jacobi inverse, back-substitution+quad-form, and the XLA residual
objective.  Methodology: scripts/_bench_util.py.

Measured (v5e, round 5, logs/r5/stage_profile.log): per 84 ms iteration
~39.5 ms is 7.7 PCG matvecs, 9.7 reduce_and_diag, 8.2 backsub+quad,
~8 assembly-on-accept, 3-7 trial objective, 0.2 preconditioner inverse
— the remainder is PCG vector ops + dispatch gaps.
"""
import sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
sys.path.insert(0, "."); sys.path.insert(0, "scripts")
from _bench_util import timed
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops import pallas_schur
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
from bundleadjustment_jl_tpu.ops.schur import (reduce_and_diag, back_substitute_quad)
from bundleadjustment_jl_tpu.ops.pcg import block_jacobi_inverse, block_jacobi_apply

pallas_schur.set_mode(True); pallas_schur.CAM_SCATTER = True
problem, _ = synthetic_bal(ncams=356, npnts=226730, obs_per_pnt=6, noise_px=1.0,
                           perturb=2e-2, seed=1, dtype=jnp.float32, pad_obs_to=512)
n = problem.nobs_pad
blocks = jax.jit(lambda p: assemble_blocks(p, with_jr=False, kminor=True))(problem)

def rad(c, p, b):
    sys_, Sd = reduce_and_diag(p, b, jnp.float32(1e2) * (1 + c * 1e-30))
    return c + Sd[0, 0, 0] * 1e-30
timed("reduce_and_diag (per lambda)", rad, jnp.float32(0.0), (problem, blocks), 32 * 4 * n)

sys_, Sd = jax.jit(lambda p, b: reduce_and_diag(p, b, jnp.float32(1e2)))(problem, blocks)
def bji(c, s):
    M = block_jacobi_inverse(s * (1 + c * 1e-30))
    return c + M[0, 0, 0] * 1e-30
timed("block_jacobi_inverse (per lambda)", bji, jnp.float32(0.0), (Sd,), 356 * 81 * 4)

dc = jnp.ones((356, 9), jnp.float32)
def bsq(c, p, b, s):
    dp, Jd2 = back_substitute_quad(p, b, s, dc * (1 + c * 1e-30))
    return c + Jd2 * 1e-30
timed("back_substitute_quad (per iter)", bsq, jnp.float32(0.0), (problem, blocks, sys_), 32 * 4 * n)

# trial objective (the linesearch-off path: one scale)
from bundleadjustment_jl_tpu.ops.residuals import residuals
def tobj(c, p, ca, pt):
    r = residuals(p, ca * (1 + c * 1e-30), pt)
    return c + 0.5 * jnp.sum(r * r) * 1e-30
timed("xla residual objective", tobj, jnp.float32(0.0), (problem, problem.cams, problem.points), 16 * 4 * n)
