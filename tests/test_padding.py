"""Shape padding for shared compiled programs (benchmark/problems.py)."""

import numpy as np
import pytest

from bundleadjustment_jl_tpu.benchmark.problems import (
    _bucket, pad_problem, pad_to_buckets)
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.solver.lm_jit import levenberg_marquardt_jit


def test_bucket_grid():
    assert _bucket(1) == 1
    assert _bucket(100) == 112          # 1.75 * 64
    assert _bucket(1024) == 1024        # exact power of two
    assert _bucket(1025) == 1280        # 1.25 * 1024
    for n in (3, 77, 5000, 123456):
        b = _bucket(n)
        assert b >= n and b <= 2 * n


def test_pad_problem_preserves_solution():
    p, _ = synthetic_bal(ncams=9, npnts=130, obs_per_pnt=4, noise_px=0.5,
                         perturb=1e-2, seed=5)
    padded = pad_problem(p, ncams_to=16, npnts_to=200, nobs_pad_to=1024)
    assert (padded.ncams, padded.npnts, padded.nobs_pad) == (16, 200, 1024)
    assert padded.nobs == p.nobs

    kw = dict(max_iters=40, satol=0.0, srtol=0.0)
    r1 = levenberg_marquardt_jit(p, **kw)
    r2 = levenberg_marquardt_jit(padded, **kw)
    assert int(r2.iterations) == int(r1.iterations)
    assert float(r2.objective) == pytest.approx(float(r1.objective),
                                                rel=1e-9)
    # padded cameras/points received no observations -> unchanged state
    np.testing.assert_array_equal(np.asarray(r2.cams[p.ncams:]),
                                  np.asarray(padded.cams[p.ncams:]))


def test_pad_to_buckets_idempotent_on_bucket_sizes():
    p, _ = synthetic_bal(ncams=8, npnts=128, obs_per_pnt=4, seed=1,
                         pad_obs_to=512)
    q = pad_to_buckets(p)
    r = pad_to_buckets(q)
    assert (r.ncams, r.npnts, r.nobs_pad) == (q.ncams, q.npnts, q.nobs_pad)
