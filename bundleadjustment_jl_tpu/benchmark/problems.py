"""Benchmark problem suite.

The reference benchmarks on 11+ downloaded BAL files
(`/root/reference/src/benchmark.jl:35-50`, `get_data.sh`). This module
provides (a) loaders for real BAL files when a data directory exists, and
(b) synthetic stand-ins with the exact (ncams, npnts, nobs) of each BAL
problem for data-free environments — same sizes as BASELINE.md.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np

from bundleadjustment_jl_tpu.io.bal import read_bal
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.models.problem import BAProblem

# (family, ncams, npnts, nobs) of the reference's benchmark set
# (BASELINE.md; names follow BAL "problem-<ncams>-<npnts>-pre"), plus the
# BASELINE.json north-star configs the reference never ran: Trafalgar-257
# (downloaded by `get_data.sh` but absent from every reference log),
# Venice-1778 and Final-13682 (beyond its single-node design).
BAL_SIZES = [  # ordered by nobs so campaign tier gating is monotone
    ("LadyBug", 49, 7776, 31843),
    ("LadyBug", 73, 11032, 46122),
    ("LadyBug", 138, 19878, 85217),
    ("LadyBug", 318, 41628, 179919),
    ("Trafalgar", 257, 65132, 225911),
    ("LadyBug", 460, 56811, 241877),
    ("LadyBug", 646, 73584, 327297),
    ("LadyBug", 810, 88814, 393775),
    ("LadyBug", 1031, 110968, 500265),
    ("Dubrovnik", 202, 132796, 751652),
    ("Dubrovnik", 356, 226730, 1255268),
    ("Venice", 427, 310384, 1699145),
    ("Venice", 1350, 894716, 4517126),
    ("Venice", 1778, 993923, 5001946),
    ("Final", 13682, 4456117, 28987644),
]


def _bucket(n: int, grid=(1.0, 1.25, 1.5, 1.75)) -> int:
    """Round up to the next value in a {2^k * g} grid (<= 25% waste)."""
    if n <= 1:
        return 1
    import math
    k = int(math.floor(math.log2(n)))
    for kk in (k, k + 1):
        for g in grid:
            v = int(round(2 ** kk * g))
            if v >= n:
                return v
    return 2 ** (k + 2)


def pad_problem(problem: BAProblem, ncams_to: int | None = None,
                npnts_to: int | None = None,
                nobs_pad_to: int | None = None) -> BAProblem:
    """Zero-weight padding of all three dimensions so different problems
    share one compiled XLA program (shapes key the compile cache; remote
    compiles are minutes each — docs/performance.md).

    Padded cameras/points replicate row 0 (valid projection math) but
    receive no observations: their gradients and Hessian blocks are
    exactly zero, so their damped steps are zero and no stopping test
    changes except the ``||x||`` scale in `small_step` (disable
    satol/srtol or account for it when padding).
    """
    ncams_to = max(ncams_to or 0, problem.ncams)
    npnts_to = max(npnts_to or 0, problem.npnts)
    nobs_pad_to = max(nobs_pad_to or 0, problem.nobs_pad)
    if (ncams_to, npnts_to, nobs_pad_to) == (
            problem.ncams, problem.npnts, problem.nobs_pad):
        return problem
    n = problem.nobs
    cams = np.asarray(problem.cams)
    points = np.asarray(problem.points)
    cams_p = np.concatenate(
        [cams, np.tile(cams[:1], (ncams_to - cams.shape[0], 1))])
    points_p = np.concatenate(
        [points, np.tile(points[:1], (npnts_to - points.shape[0], 1))])
    return BAProblem.from_arrays(
        cams_p, points_p, np.asarray(problem.cam_idx[:n]),
        np.asarray(problem.pnt_idx[:n]), np.asarray(problem.pt2d[:n]),
        dtype=problem.dtype, pad_obs_to=nobs_pad_to, name=problem.name)


def pad_to_buckets(problem: BAProblem) -> BAProblem:
    """Pad all three dims to the shared-shape grid (`_bucket`)."""
    return pad_problem(problem, _bucket(problem.ncams),
                       _bucket(problem.npnts),
                       _bucket(max(problem.nobs_pad, 1024)))


def synthetic_suite(max_nobs: int | None = None, dtype=np.float64,
                    noise_px: float = 1.0, perturb: float = 2e-2,
                    pad_obs_to: int = 512,
                    ) -> Iterator[Tuple[str, BAProblem]]:
    """Generate synthetic problems at the BAL benchmark sizes."""
    for family, ncams, npnts, nobs in BAL_SIZES:
        if max_nobs is not None and nobs > max_nobs:
            continue
        obs_per_pnt = max(2, round(nobs / npnts))
        name = f"{family}-{ncams}-{npnts}-synth"
        problem, _ = synthetic_bal(
            ncams=ncams, npnts=npnts, obs_per_pnt=obs_per_pnt,
            noise_px=noise_px, perturb=perturb, dtype=dtype,
            pad_obs_to=pad_obs_to, seed=ncams, name=name)
        yield name, problem


def bal_suite(data_dir: str, dtype=np.float64, pad_obs_to: int = 512,
              ) -> Iterator[Tuple[str, BAProblem]]:
    """Load every real BAL file under ``data_dir`` (family subdirs like the
    reference's `Data/{LadyBug,Trafalgar,...}`, `get_data.sh:1-85`)."""
    for root, _, files in sorted(os.walk(data_dir)):
        for f in sorted(files):
            if f.endswith((".txt", ".txt.bz2")) and "problem" in f:
                path = os.path.join(root, f)
                yield os.path.basename(root) + "/" + f, read_bal(
                    path, dtype=dtype, pad_obs_to=pad_obs_to)
