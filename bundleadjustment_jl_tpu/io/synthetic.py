"""Synthetic BAL-style problem generator.

The reference benchmarks exclusively on downloaded BAL files
(`/root/reference/get_data.sh`); this module generates statistically similar
problems of any size on-host (numpy), so correctness and scaling tests never
need network access. Geometry follows BAL conventions: cameras with small
axis-angle rotations placed so points sit at negative camera-frame depth
(BAL projects with ``P2 = -P1[:2]/P1[2]``), focal ~400, mild radial
distortion, Gaussian pixel noise, perturbed initial estimates.

With ``noise_px=0`` and ``perturb=0`` the generated state is the global
optimum (objective 0) — the anchor for solver convergence tests. With noise,
the optimum objective is approximately ``nobs * noise_px**2`` (chi-square),
useful as a loose convergence target.
"""

from __future__ import annotations

import numpy as np

from bundleadjustment_jl_tpu.models.problem import BAProblem


def _cross_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise 3D cross product (np.cross is pathologically slow on some
    numpy builds — 7+ s for 500k rows)."""
    out = np.empty_like(a)
    out[:, 0] = a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1]
    out[:, 1] = a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2]
    out[:, 2] = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    return out


def _project_np(cams: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Vectorized numpy twin of models.camera.project (host-side oracle)."""
    r = cams[:, 0:3]
    t = cams[:, 3:6]
    k1, k2, f = cams[:, 6], cams[:, 7], cams[:, 8]
    # einsum row-norm: np.linalg.norm materializes an extra temp and was
    # ~4 s at 1.1M rows on this numpy build
    theta = np.sqrt(np.einsum("ij,ij->i", r, r))[:, None]
    theta = np.maximum(theta, 1e-30)
    k = r / theta
    c = np.cos(theta)
    s = np.sin(theta)
    kdX = np.sum(k * points, axis=1, keepdims=True)
    p1 = c * points + s * _cross_rows(k, points) + (1 - c) * kdX * k + t
    p2 = -p1[:, 0:2] / p1[:, 2:3]
    n2 = np.sum(p2 * p2, axis=1)
    rho = 1.0 + k1 * n2 + k2 * n2 * n2
    return (f * rho)[:, None] * p2


def synthetic_bal(ncams: int = 16, npnts: int = 256, obs_per_pnt: int = 4,
                  noise_px: float = 0.5, perturb: float = 1e-3,
                  seed: int = 0, dtype=np.float64, pad_obs_to: int = 128,
                  name: str | None = None,
                  cam_window: int | float | None = None,
                  ) -> tuple[BAProblem, dict]:
    """Generate a synthetic BA problem.

    Returns ``(problem, truth)`` where ``truth`` holds the ground-truth
    ``cams``/``points`` and the objective value at the truth.

    ``cam_window``: covisibility locality. ``None`` (default) samples each
    point's cameras uniformly — the WORST case for camera clustering.
    Real BAL data clusters: LadyBug is a vehicle trajectory (points seen
    by consecutive frames), Trafalgar/Venice are landmark photo clusters.
    A window ``w`` (absolute count, or a fraction of ncams when < 1)
    draws each point's cameras without replacement from a contiguous
    wrapped window of ``w`` camera ids anchored per point — points with
    nearby ids share nearby cameras, reproducing the covisibility
    banding real BAL files show.
    """
    rng = np.random.default_rng(seed)
    obs_per_pnt = min(obs_per_pnt, ncams)

    # Ground-truth scene: point cloud in a unit-ish ball around the origin.
    points = rng.normal(size=(npnts, 3)) * np.array([1.0, 1.0, 0.3])

    # Cameras: small rotations, positioned so the cloud is at z ~ -depth in
    # camera frame (BAL negative-depth convention).
    depth = 6.0
    cams = np.zeros((ncams, 9))
    cams[:, 0:3] = rng.normal(scale=0.05, size=(ncams, 3))        # rodrigues
    cams[:, 3:5] = rng.normal(scale=0.3, size=(ncams, 2))         # tx, ty
    cams[:, 5] = -depth + rng.normal(scale=0.3, size=ncams)       # tz
    cams[:, 6] = rng.normal(scale=1e-7, size=ncams)               # k1
    cams[:, 7] = rng.normal(scale=1e-13, size=ncams)              # k2
    cams[:, 8] = 400.0 + rng.normal(scale=20.0, size=ncams)       # f

    # Observations: each point seen by `obs_per_pnt` distinct cameras, every
    # (cam, pnt) pair unique (a BAL invariant that `ops.schur` exploits for
    # the exact block-Jacobi preconditioner). Every camera is guaranteed at
    # least one observation by forcing camera ``p`` into point p's camera
    # set for the first ncams points. Sampling is vectorized: draw all rows
    # at once, then re-roll rows containing duplicates (geometric
    # convergence for obs_per_pnt << ncams; exact per-row sampling when the
    # ratio is too high for rejection to converge quickly).
    pnt_idx = np.repeat(np.arange(npnts), obs_per_pnt)
    k = obs_per_pnt
    if cam_window is not None:
        w = int(round(cam_window * ncams)) if cam_window < 1 \
            else int(cam_window)
        w = min(max(w, k), ncams)
        # anchor tied to the point id (sorted points -> banded covisibility,
        # like a trajectory) plus jitter; k distinct offsets inside the
        # window via per-row argsort of uniforms (exact, vectorized).
        anchors = ((np.arange(npnts) * ncams) // max(npnts, 1)
                   + rng.integers(0, max(w // 2, 1), size=npnts))
        cam_rows = np.empty((npnts, k), dtype=np.int64)
        step = max(1, (1 << 25) // w)      # bound the uniforms temp
        for lo in range(0, npnts, step):
            hi = min(lo + step, npnts)
            offs = np.argsort(rng.random((hi - lo, w)), axis=1)[:, :k]
            cam_rows[lo:hi] = (anchors[lo:hi, None] + offs) % ncams
    elif k > ncams // 2 or ncams <= 8:
        cam_rows = np.empty((npnts, k), dtype=np.int64)
        for p in range(npnts):
            cam_rows[p] = rng.choice(ncams, size=k, replace=False)
    else:
        cam_rows = rng.integers(0, ncams, size=(npnts, k))
        while True:
            s = np.sort(cam_rows, axis=1)
            dup = (s[:, 1:] == s[:, :-1]).any(axis=1)
            if not dup.any():
                break
            cam_rows[dup] = rng.integers(0, ncams, size=(int(dup.sum()), k))
    # Coverage: force camera p into row p (re-sampling row p's remaining
    # slots whenever the forced camera collides).
    n_forced = min(ncams, npnts)
    cam_rows[:n_forced, 0] = np.arange(n_forced)
    head = cam_rows[:n_forced]
    s = np.sort(head, axis=1)
    dup = (s[:, 1:] == s[:, :-1]).any(axis=1)
    # Re-draw colliding rows exactly (without replacement, excluding the
    # forced camera) — a rejection loop here stalls when obs_per_pnt is
    # close to ncams (success prob ~ (ncams-1)!/ncams^(k-1)).
    for ri in np.flatnonzero(dup):
        pool = np.delete(np.arange(ncams), cam_rows[ri, 0])
        cam_rows[ri, 1:] = rng.choice(pool, size=k - 1, replace=False)
    cam_idx = cam_rows.reshape(-1)

    # np.take, not fancy indexing: cams[cam_idx] is ~65x slower on this
    # numpy build (2 s vs 0.03 s for 1.1M rows — same pathology as
    # np.cross, see _cross_rows)
    cams_obs = np.take(cams, cam_idx, axis=0)
    pnts_obs = np.take(points, pnt_idx, axis=0)
    proj = _project_np(cams_obs, pnts_obs)
    del cams_obs, pnts_obs
    noise = rng.normal(scale=noise_px, size=proj.shape)
    pt2d = proj + noise

    # Initial estimate: truth perturbed (relative for f, absolute elsewhere).
    cams0 = cams.copy()
    cams0[:, 0:6] += rng.normal(scale=perturb, size=(ncams, 6))
    cams0[:, 8] *= 1.0 + rng.normal(scale=perturb, size=ncams)
    points0 = points + rng.normal(scale=perturb, size=points.shape)

    if name is None:
        name = f"synthetic-{ncams}-{npnts}"
    problem = BAProblem.from_arrays(cams0, points0, cam_idx, pnt_idx, pt2d,
                                    dtype=dtype, pad_obs_to=pad_obs_to,
                                    name=name)
    # residual at the truth is exactly the added noise (proj - pt2d) —
    # no second projection pass (it dominated generation time at Final
    # scale: two (nobs, 9) float64 gathers + the full chain again).
    truth = {
        "cams": cams,
        "points": points,
        "objective": 0.5 * float(np.sum(noise ** 2)),
    }
    return problem, truth
