"""Covisibility-aware observation partitioning.

The reference uses METIS only as a fill-reducing *ordering* for its sparse
factorizations (`/root/reference/src/lm.jl:86-87`); the Schur formulation
eliminates that need (SURVEY.md §2.2), but METIS's *partitioning* role
reappears at scale-out: which observations live on which device.

Round-robin sharding (the default `shard_problem`) is load-balanced but
locality-free — every device touches every camera. This module instead
groups observations by camera with a greedy balanced partition (LPT bin
packing on per-camera observation counts), so each device's shard touches
only ~ncams/ndev cameras. Per-device partial gradients/Hessian blocks then
hit a small slice of camera space, which keeps the camera-space
reduce-scatter/psum volume at the collective's lower bound and makes
per-device gather footprints compact.

Host-side numpy; runs once at load time (O(nobs log nobs)).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from bundleadjustment_jl_tpu.models.problem import BAProblem


def greedy_camera_partition(cam_idx: np.ndarray, ncams: int,
                            n_parts: int) -> np.ndarray:
    """Assign cameras to parts, balancing total observation counts.

    Longest-processing-time greedy: cameras sorted by observation count
    descending, each placed on the currently lightest part. Returns
    ``part_of_cam`` (ncams,) int32.
    """
    counts = np.bincount(cam_idx, minlength=ncams)
    order = np.argsort(-counts, kind="stable")
    load = np.zeros(n_parts, dtype=np.int64)
    part_of_cam = np.zeros(ncams, dtype=np.int32)
    for c in order:
        p = int(np.argmin(load))
        part_of_cam[c] = p
        load[p] += counts[c]
    return part_of_cam


def partition_problem(problem: BAProblem, n_parts: int,
                      ) -> Tuple[BAProblem, np.ndarray]:
    """Reorder + re-pad a problem so equal-size observation shards align
    with camera groups.

    Returns ``(partitioned_problem, part_of_cam)``. The new problem has
    ``nobs_pad = n_parts * max_part_size`` with each part's observations
    contiguous and zero-weight padding at each part's tail, so a
    ``shard_problem`` over ``n_parts`` devices gives every device exactly
    one camera group.
    """
    n = problem.nobs
    cam_idx = np.asarray(problem.cam_idx[:n])
    pnt_idx = np.asarray(problem.pnt_idx[:n])
    pt2d = np.asarray(problem.pt2d[:n])
    w = np.asarray(problem.w[:n])

    part_of_cam = greedy_camera_partition(cam_idx, problem.ncams, n_parts)
    part_of_obs = part_of_cam[cam_idx]
    order = np.argsort(part_of_obs, kind="stable")
    sizes = np.bincount(part_of_obs, minlength=n_parts)
    # pad every part to the max size, in multiples of 8 for tiling
    chunk = int(-(-sizes.max() // 8) * 8)

    dtype = np.asarray(problem.pt2d).dtype
    ci = np.zeros(n_parts * chunk, dtype=np.int32)
    pi = np.zeros(n_parts * chunk, dtype=np.int32)
    xy = np.zeros((n_parts * chunk, 2), dtype=dtype)
    ww = np.zeros(n_parts * chunk, dtype=dtype)
    start = 0
    for p in range(n_parts):
        rows = order[start:start + sizes[p]]
        dst = p * chunk
        ci[dst:dst + sizes[p]] = cam_idx[rows]
        pi[dst:dst + sizes[p]] = pnt_idx[rows]
        xy[dst:dst + sizes[p]] = pt2d[rows]
        ww[dst:dst + sizes[p]] = w[rows]
        start += sizes[p]

    # Rebuild sorted-layout metadata for the partitioned row order
    # (VERDICT r1 #7). Rows are no longer globally point-sorted (a point's
    # observations can span parts), so a `pnt_perm` permutation into
    # point-sorted order accompanies `pnt_starts`; padded rows (w == 0,
    # ci = pi = 0) sort into segment 0 and contribute zero values.
    from bundleadjustment_jl_tpu.ops.segsum import make_starts
    total = n_parts * chunk
    pnt_perm = np.argsort(pi, kind="stable").astype(np.int32)
    pnt_starts = make_starts(pi[pnt_perm], problem.npnts, total)
    cam_perm = np.argsort(ci, kind="stable").astype(np.int32)
    cam_starts = make_starts(ci[cam_perm], problem.ncams, total)

    import jax.numpy as jnp
    out = BAProblem(
        cams=problem.cams, points=problem.points,
        cam_idx=jnp.asarray(ci), pnt_idx=jnp.asarray(pi),
        pt2d=jnp.asarray(xy), w=jnp.asarray(ww),
        nobs=n, name=problem.name + f"-part{n_parts}",
        pnt_starts=jnp.asarray(pnt_starts),
        cam_perm=jnp.asarray(cam_perm),
        cam_starts=jnp.asarray(cam_starts),
        pnt_perm=jnp.asarray(pnt_perm))
    return out, part_of_cam


def partition_stats(problem: BAProblem, part_of_cam: np.ndarray,
                    n_parts: int) -> dict:
    """Balance / locality diagnostics for a partition."""
    n = problem.nobs
    cam_idx = np.asarray(problem.cam_idx[:n])
    pnt_idx = np.asarray(problem.pnt_idx[:n])
    part_of_obs = part_of_cam[cam_idx]
    sizes = np.bincount(part_of_obs, minlength=n_parts)
    # points seen from multiple parts => cross-device coupling in Schur
    pnt_parts = {}
    cut = 0
    seen = set()
    for p, q in zip(pnt_idx, part_of_obs):
        prev = pnt_parts.setdefault(p, q)
        if prev != q and (p, q) not in seen:
            cut += 1
            seen.add((p, q))
    return {
        "sizes": sizes.tolist(),
        "imbalance": float(sizes.max() / max(sizes.mean(), 1.0)),
        # mean number of *extra* parts each point is seen from (0 = every
        # point local to one device; this is the Schur cross-device
        # coupling volume)
        "avg_extra_parts_per_point": cut / max(len(pnt_parts), 1),
    }
