"""A/B kernel probes at Final-13682 shapes (31.2M obs, 13682 cams).

The whole-solve profile (`tpu_final_profile.py`, logs/r3e/) attributed
the ~33 s/iteration Final cost to (a) the scatter-assembly scan — full
per-point accumulator relayout copies every 65536-row step, ~16 s per
assembly — and (b) per-matvec camera-direction one-hot contractions
whose MXU utilization is d_out/128.  This probe measures every candidate
replacement stage in isolation at the real problem's shapes (cached
Final npz) so the re-routing is chosen on numbers.

All device arrays are jit ARGUMENTS (never closed over — closures become
HLO constants and 400+ MB executables on the remote backend).

Groups (separate OS processes — HBM + crash isolation):
  A  current reduce kernels (cam_scatter d9/d90, wtv_point_reduce)
  B  cam-sorted route (operand gather + wt_cam_reduce; per-accept
     W_cam_t / W_t builds)
  C  assembly variants (current scatter scan; fully-fused
     assemble_scatter at 13682 cams; split linearize+reduces; chunked
     objective)
  D  fused single-stream matvec at 13682 cams (gather+scatter one-hots)

Usage: python scripts/tpu_final_abtest.py {A|B|C|D}
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from bundleadjustment_jl_tpu.ops import pallas_schur as ps  # noqa: E402
from scripts._bench_util import timed  # noqa: E402
from scripts.tpu_capacity import _cached_problem  # noqa: E402


def load():
    t0 = time.perf_counter()
    problem = _cached_problem("Final", 13682, 4456117, 7)
    print(f"load {time.perf_counter() - t0:.0f}s nobs={problem.nobs} "
          f"nobs_pad={problem.nobs_pad}", flush=True)
    ps.set_mode(True)
    return problem


def rand_wt(n_pad, dtype=jnp.bfloat16, rows=32):
    k = jax.random.PRNGKey(0)
    return jax.random.normal(k, (rows, n_pad), jnp.float32).astype(dtype)


def group_a(problem):
    n_pad = problem.nobs_pad
    ncams, npnts = problem.ncams, problem.npnts
    W_t = rand_wt(n_pad)
    op8 = jax.random.normal(jax.random.PRNGKey(1), (8, npnts), jnp.float32)
    op16 = jax.random.normal(jax.random.PRNGKey(2), (16, npnts),
                             jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(3), (ncams, 9), jnp.float32)
    hpp = jax.random.normal(jax.random.PRNGKey(4), (npnts * 9,),
                            jnp.float32)
    bounds = jax.device_put(np.asarray(
        ps.tile_bounds(problem.pnt_starts, npnts)))
    nb_w = n_pad * 32 * 2

    timed("cam_scatter_reduce d9 (matvec)",
          lambda c, W, ci, b, pi, o: c + ps.cam_scatter_reduce(
              W, ci, b, ncams, d_out=9, prod=ps._prod_w_op,
              idx_row=pi, op_t=o * c)[0, 0],
          jnp.float32(1.0),
          (W_t, problem.cam_idx, bounds, problem.pnt_idx, op8), nb_w)
    timed("cam_scatter_reduce d90 (diag+rhs)",
          lambda c, W, ci, b, pi, o: c + ps.cam_scatter_reduce(
              W, ci, b, ncams, d_out=90, prod=ps._prod_wcw_rhs,
              idx_row=pi, op_t=o * c)[0, 0],
          jnp.float32(1.0),
          (W_t, problem.cam_idx, bounds, problem.pnt_idx, op16), nb_w)
    timed("wtv_point_reduce k8 (pnt dir)",
          lambda c, W, vv, pi, ci, st, h: c + ps.wtv_point_reduce(
              W, vv * c, pi, ci, st, npnts, hpp_inv_f=h,
              out_k8=True)[0, 0],
          jnp.float32(1.0),
          (W_t, v, problem.pnt_idx, problem.cam_idx, problem.pnt_starts,
           hpp),
          nb_w + 16 * n_pad * 4)


def group_b(problem):
    n_pad = problem.nobs_pad
    ncams, npnts = problem.ncams, problem.npnts
    W_t = rand_wt(n_pad)
    op8 = jax.random.normal(jax.random.PRNGKey(1), (8, npnts), jnp.float32)
    cam_perm = problem.cam_perm
    pidx_cam = jax.device_put(np.take(np.asarray(problem.pnt_idx),
                                      np.asarray(cam_perm)))
    cam_sorted = jax.device_put(np.take(np.asarray(problem.cam_idx),
                                        np.asarray(cam_perm)))
    W_cam_t = jax.jit(ps.gather_k_minor)(W_t, cam_perm)
    xt8_cam = jax.jit(ps.gather_k_minor)(op8, pidx_cam)
    float(jnp.sum(xt8_cam[:, :8]))

    timed("gather op8 (8,npnts)->(8,n)",
          lambda c, o, pi: c + ps.gather_k_minor(o * c, pi)[0, 0],
          jnp.float32(1.0), (op8, pidx_cam), 8 * n_pad * 4 * 2)
    timed("wt_cam_reduce (cam-sorted segsum)",
          lambda c, W, x, ci, st: c + ps.wt_cam_reduce(
              W, x * c, ci, st, ncams)[0, 0],
          jnp.float32(1.0),
          (W_cam_t, xt8_cam, cam_sorted, problem.cam_starts),
          n_pad * (32 * 2 + 8 * 4))
    # (The round-3/4 "gather W_t -> W_cam_t per accept" probe is gone:
    # its 32 random-access flat row gathers reproducibly crash the
    # remote TPU worker at 31M rows, and no code path builds W_cam_t by
    # permutation anymore — round 4 replaced it with re-linearization,
    # and round 5's factorized cam-scatter reduce removed the
    # camera-sorted W at Final entirely.)
    W_f = jax.random.normal(jax.random.PRNGKey(5), (n_pad * 27,),
                            jnp.float32).astype(jnp.bfloat16)
    timed("to_k_minor W_f->W_t (per accept)",
          lambda c, w: c + ps.to_k_minor(
              (w.astype(jnp.float32) * c).astype(w.dtype))[0, 0]
          .astype(jnp.float32),
          jnp.float32(1.0), (W_f,), 27 * n_pad * 2 * 2)


def group_c(problem):
    from bundleadjustment_jl_tpu.ops import normal
    from bundleadjustment_jl_tpu.ops.residuals import objective_chunked
    n_pad = problem.nobs_pad
    nb = n_pad * (16 + 32) * 4

    timed("assemble scatter-scan (current)",
          lambda c, pr, ca, pt: normal.assemble_blocks(
              pr, ca * c, pt, kminor=False,
              w_dtype=jnp.bfloat16).obj + c,
          jnp.float32(1.0), (problem, problem.cams, problem.points),
          nb, n_hi=4)

    ps.CAM_SCATTER = True
    ps.CAM_SCATTER_MAX_CAMS = 16384
    ps.GATHER_TABLE_MAX_CAMS = 16384
    timed("assemble fused-scatter @13682",
          lambda c, pr, ca, pt: normal._assemble_kminor(
              pr, ca * c, pt, None, w_dtype=jnp.bfloat16).obj + c,
          jnp.float32(1.0), (problem, problem.cams, problem.points),
          nb, n_hi=4)

    ps.GATHER_TABLE_MAX_CAMS = 2048   # forces the split branch
    timed("assemble split linearize @13682",
          lambda c, pr, ca, pt: normal._assemble_kminor(
              pr, ca * c, pt, None, w_dtype=jnp.bfloat16).obj + c,
          jnp.float32(1.0), (problem, problem.cams, problem.points),
          nb, n_hi=4)

    timed("objective chunked-scan (current)",
          lambda c, pr, ca, pt: objective_chunked(
              pr, ca * c, pt, ps.GATHER_CHUNK) + c,
          jnp.float32(1.0), (problem, problem.cams, problem.points),
          n_pad * 16 * 4, n_hi=4)


def group_d(problem):
    n_pad = problem.nobs_pad
    ncams, npnts = problem.ncams, problem.npnts
    W_t = rand_wt(n_pad)
    v = jax.random.normal(jax.random.PRNGKey(3), (ncams, 9), jnp.float32)
    hpp = jax.random.normal(jax.random.PRNGKey(4), (npnts * 9,),
                            jnp.float32)
    bounds = jax.device_put(np.asarray(
        ps.tile_bounds(problem.pnt_starts, npnts)))
    ps.CAM_SCATTER = True
    ps.CAM_SCATTER_MAX_CAMS = 16384
    ps.GATHER_TABLE_MAX_CAMS = 16384
    timed("matvec_cam_scatter fused @13682",
          lambda c, W, vv, ci, pi, h, b: c + ps.matvec_cam_scatter(
              W, vv * c, ci, pi, h, b, ncams, npnts)[0, 0],
          jnp.float32(1.0),
          (W_t, v, problem.cam_idx, problem.pnt_idx, hpp, bounds),
          n_pad * 32 * 2)


def main():
    group = sys.argv[1].upper()
    problem = load()
    problem = jax.device_put(problem)
    float(sum(jnp.sum(x.astype(jnp.float32))
              for x in jax.tree.leaves(problem)))
    {"A": group_a, "B": group_b, "C": group_c, "D": group_d}[group](
        problem)
    print(f"group {group} done", flush=True)


if __name__ == "__main__":
    main()
