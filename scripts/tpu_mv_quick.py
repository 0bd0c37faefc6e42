"""Matvec-only timing probe (see tpu_mv_sweep.py for methodology)."""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
from _bench_util import timed  # noqa: E402
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal  # noqa: E402
from bundleadjustment_jl_tpu.ops import pallas_schur  # noqa: E402
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks  # noqa: E402
from bundleadjustment_jl_tpu.ops.schur import reduce_system, schur_matvec  # noqa: E402


def main(ncams=356, npnts=226730, obs_per_pnt=6, reps=3):
    pallas_schur.set_mode(True)
    problem, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                               obs_per_pnt=obs_per_pnt, noise_px=1.0,
                               perturb=2e-2, seed=1, dtype=jnp.float32,
                               pad_obs_to=512)
    n = problem.nobs_pad
    blocks = jax.jit(lambda p: assemble_blocks(
        p, with_jr=False, kminor=True))(problem)
    sys_ = jax.jit(reduce_system)(problem, blocks, jnp.float32(1e2))

    def mv(c, s):
        u = schur_matvec(s, jnp.full_like(s.b, 1.0) * (1 + c * 1e-30))
        return c + u[0, 0] * 1e-30

    for r in range(reps):
        timed(f"schur_matvec[{r}]", mv, jnp.float32(0.0), (sys_,),
              nbytes=(2 * 32 + 16 + 8 + 2 * 4) * 4 * n, n_hi=32)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
