"""Break down the k-minor fused assembly cost into its stages.

`assemble_blocks(kminor=True)` was measured the dominant per-iteration
cost at Dubrovnik-356 scale (236 ms of a ~700 ms LM iteration,
logs/profile_r2f_dub356.log). This probe times its stages separately so
the optimization target is a measurement, not a guess:

  lin_scan      chunked rj_raw linearization -> stacked (26, n) JR
  cam_gather    JR_t[:, cam_perm]  (lane-dim gather of a (32, n) array)
  jtj_cam       fused [Hcc|g_c] reduce kernel (camera-sorted rows)
  jtj_pnt       fused [Hpp|g_p] reduce kernel (point-sorted rows)
  w_from_jr     k-minor W = Jc'Jp row-FMA (both orders)

Methodology: scripts/_bench_util.py (arrays as jit arguments,
loop-amortized, device->host fetch bracket). Usage:
    BA_PALLAS=1 python scripts/tpu_asm_profile.py [ncams npnts obs_per_pnt]
"""

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
from bundleadjustment_jl_tpu.ops.normal import (  # noqa: E402
    _assemble_kminor, auto_chunk)


def main(ncams=356, npnts=226730, obs_per_pnt=6):
    print(f"backend={jax.default_backend()}", flush=True)
    problem, _ = synthetic_bal(ncams=ncams, npnts=npnts,
                               obs_per_pnt=obs_per_pnt, noise_px=1.0,
                               perturb=2e-2, seed=1, dtype=jnp.float32,
                               pad_obs_to=512)
    n = problem.nobs_pad
    print(f"nobs_pad={n} chunk={auto_chunk(n)}", flush=True)

    # Stage inputs, materialized once (device arrays passed as args).
    blocks = jax.jit(lambda p: _assemble_kminor(
        p, p.cams, p.points, auto_chunk(n)))(problem)
    JR_t = jax.jit(lambda p: _lin_scan(p))(problem)
    JR_cam_t = jax.jit(lambda a, p: a[:, p.cam_perm])(JR_t, problem)

    f32 = 4

    def lin_scan(c, p):
        out = _lin_scan(p, eps=c * 1e-30)
        return c + out[0, 0] * 1e-30

    timed("lin_scan -> JR (26, n)", lin_scan, jnp.float32(0.0), (problem,),
          nbytes=(40 + 2 * 26 * f32) * n)

    def cam_gather(c, a, p):
        # carry must perturb the gather INPUT: `gather + c` lets XLA hoist
        # the loop-invariant gather and time only the elementwise add.
        out = (a * (1 + c * 1e-30))[:, p.cam_perm]
        return c + out[0, 0] * 1e-30

    timed("cam_gather (32, n)[:, perm]", cam_gather, jnp.float32(0.0),
          (JR_t, problem), nbytes=2 * 32 * f32 * n)

    def jtj_cam(c, a, p):
        out = pallas_schur.jtj_cam_reduce(
            a * (1 + c * 1e-30), p.cam_idx[p.cam_perm], p.cam_starts,
            p.ncams)
        return c + out[0, 0] * 1e-30

    timed("jtj_cam_reduce [Hcc|g_c]", jtj_cam, jnp.float32(0.0),
          (JR_cam_t, problem), nbytes=32 * f32 * n)

    def jtj_pnt(c, a, p):
        out = pallas_schur.jtj_pnt_reduce(
            a * (1 + c * 1e-30), p.pnt_idx, p.pnt_starts, p.npnts)
        return c + out[0, 0] * 1e-30

    timed("jtj_pnt_reduce [Hpp|g_p]", jtj_pnt, jnp.float32(0.0),
          (JR_t, problem), nbytes=16 * f32 * n)

    def wfj(c, a):
        out = pallas_schur.w_from_jr(a * (1 + c * 1e-30),
                                     dtype=jnp.float32)
        return c + out[0, 0] * 1e-30

    timed("w_from_jr (27-row FMA)", wfj, jnp.float32(0.0), (JR_t,),
          nbytes=(24 + 27) * f32 * n)

    def full(c, p):
        b = _assemble_kminor(p, p.cams + c * 1e-30, p.points,
                             auto_chunk(n))
        return c + jnp.sum(b.g_c_f) * 1e-30

    timed("_assemble_kminor (full)", full, jnp.float32(0.0), (problem,),
          nbytes=(40 + 6 * 32 * f32) * n, n_hi=8)


def _lin_scan(problem, eps=0.0):
    """The linearization-scan stage of `_assemble_kminor`, isolated."""
    from bundleadjustment_jl_tpu.ops.jacobian import rj_raw
    cams = problem.cams + eps
    points = problem.points
    n = problem.nobs_pad
    chunk = auto_chunk(n)

    def stack26(r, Jc, Jp, m):
        return jnp.concatenate([Jc.reshape(m, 18).T, Jp.reshape(m, 6).T,
                                r.reshape(m, 2).T], axis=0)

    if chunk is None or n <= chunk:
        from bundleadjustment_jl_tpu.ops.jacobian import (
            residuals_and_jacobian)
        r, Jc, Jp = residuals_and_jacobian(problem, cams, points)
        return pallas_schur.pad_rows(stack26(r, Jc, Jp, n), 32)
    nchunks = n // chunk
    nfull = nchunks * chunk
    rem = n - nfull

    def block(ci, pi, xy_f, w, m):
        r, Jc, Jp = rj_raw(cams, points, ci, pi, xy_f.reshape(m, 2), w)
        return stack26(r, Jc, Jp, m).reshape(-1)

    xs = (problem.cam_idx[:nfull].reshape(nchunks, chunk),
          problem.pnt_idx[:nfull].reshape(nchunks, chunk),
          problem.pt2d.reshape(-1)[:nfull * 2].reshape(nchunks, chunk * 2),
          problem.w[:nfull].reshape(nchunks, chunk))
    _, ys = jax.lax.scan(
        lambda c, x: (c, block(*x, chunk)), jnp.zeros((), cams.dtype), xs)
    JR26 = jnp.moveaxis(ys.reshape(nchunks, 26, chunk), 0, 1).reshape(
        26, nfull)
    if rem:
        tail = block(problem.cam_idx[nfull:], problem.pnt_idx[nfull:],
                     problem.pt2d.reshape(-1)[nfull * 2:],
                     problem.w[nfull:], rem).reshape(26, rem)
        JR26 = jnp.concatenate([JR26, tail], axis=1)
    return pallas_schur.pad_rows(JR26, 32)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
