"""Covisibility partitioner: balance, equivalence, sharded-solve parity."""

import numpy as np

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.residuals import objective
from bundleadjustment_jl_tpu.parallel.mesh import make_mesh, shard_problem
from bundleadjustment_jl_tpu.parallel.partition import (
    greedy_camera_partition, partition_problem, partition_stats)
from bundleadjustment_jl_tpu.solver.lm_jit import (
    STATUS_NAMES, levenberg_marquardt_jit)


def _problem():
    p, _ = synthetic_bal(ncams=16, npnts=120, obs_per_pnt=4,
                         noise_px=0.3, perturb=2e-3, seed=80)
    return p


def test_greedy_partition_balances():
    p = _problem()
    part = greedy_camera_partition(np.asarray(p.cam_idx[:p.nobs]),
                                   p.ncams, 4)
    assert part.shape == (p.ncams,)
    assert set(part) == {0, 1, 2, 3}
    stats = partition_stats(p, part, 4)
    assert stats["imbalance"] < 1.5


def test_partitioned_problem_is_equivalent():
    p = _problem()
    q, part = partition_problem(p, 8)
    assert q.nobs == p.nobs
    assert q.nobs_pad % 8 == 0
    np.testing.assert_allclose(float(objective(p)), float(objective(q)),
                               rtol=1e-12)
    # each shard's real observations touch only its own camera group
    chunk = q.nobs_pad // 8
    ci = np.asarray(q.cam_idx)
    w = np.asarray(q.w)
    for s in range(8):
        rows = slice(s * chunk, (s + 1) * chunk)
        real = w[rows] > 0
        cams_here = np.unique(ci[rows][real])
        assert all(part[c] == s for c in cams_here)


def test_partitioned_sharded_solve_matches():
    p = _problem()
    q, _ = partition_problem(p, 8)
    sharded = shard_problem(q, make_mesh(8))
    r0 = levenberg_marquardt_jit(p, max_iters=30)
    r1 = levenberg_marquardt_jit(sharded, max_iters=30)
    assert STATUS_NAMES[int(r1.status)] != "exception"
    np.testing.assert_allclose(float(r1.objective), float(r0.objective),
                               rtol=1e-6)
