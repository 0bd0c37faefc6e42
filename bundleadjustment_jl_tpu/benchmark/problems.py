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
BAL_SIZES = [
    ("LadyBug", 49, 7776, 31843),
    ("LadyBug", 73, 11032, 46122),
    ("LadyBug", 138, 19878, 85217),
    ("LadyBug", 318, 41628, 179919),
    ("LadyBug", 460, 56811, 241877),
    ("LadyBug", 646, 73584, 327297),
    ("LadyBug", 810, 88814, 393775),
    ("LadyBug", 1031, 110968, 500265),
    ("Trafalgar", 257, 65132, 225911),
    ("Dubrovnik", 202, 132796, 751652),
    ("Dubrovnik", 356, 226730, 1255268),
    ("Venice", 427, 310384, 1699145),
    ("Venice", 1350, 894716, 4517126),
    ("Venice", 1778, 993923, 5001946),
    ("Final", 13682, 4456117, 28987644),
]


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
