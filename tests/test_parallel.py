"""Multi-device tests on the 8-way virtual CPU mesh (conftest sets
``xla_force_host_platform_device_count=8`` — SURVEY.md §5's prescription for
testing meshes without TPU hardware). The reference has no distributed
concept at all; these tests pin the sharded path to the single-device one."""

import jax
import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
from bundleadjustment_jl_tpu.ops.residuals import objective
from bundleadjustment_jl_tpu.parallel.mesh import make_mesh, shard_problem
from bundleadjustment_jl_tpu.solver.lm_jit import (
    STATUS_NAMES, levenberg_marquardt_jit)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def problems(mesh):
    problem, _ = synthetic_bal(ncams=8, npnts=64, obs_per_pnt=4,
                               noise_px=0.3, perturb=2e-3, seed=21,
                               pad_obs_to=128)
    return problem, shard_problem(problem, mesh)


def test_sharded_arrays_are_distributed(problems, mesh):
    _, sharded = problems
    assert len(sharded.cam_idx.sharding.device_set) == 8
    assert sharded.cams.sharding.is_fully_replicated


def test_objective_matches_across_shardings(problems):
    single, sharded = problems
    np.testing.assert_allclose(float(objective(single)),
                               float(objective(sharded)), rtol=1e-12)


def test_blocks_match_across_shardings(problems):
    single, sharded = problems
    b1 = assemble_blocks(single)
    b2 = assemble_blocks(sharded)
    np.testing.assert_allclose(np.asarray(b1.g_c), np.asarray(b2.g_c),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(b1.Hpp), np.asarray(b2.Hpp),
                               rtol=1e-10, atol=1e-10)


def test_full_jit_solve_matches_across_shardings(problems):
    single, sharded = problems
    r1 = levenberg_marquardt_jit(single, max_iters=30)
    r2 = levenberg_marquardt_jit(sharded, max_iters=30)
    assert STATUS_NAMES[int(r2.status)] in (
        "first_order", "small_step", "small_residual", "small_obj_change")
    # bitwise-identical control flow is not guaranteed (reduction orders
    # differ across device counts) but the optimum must agree tightly
    np.testing.assert_allclose(float(r2.objective), float(r1.objective),
                               rtol=1e-6)


def test_indivisible_padding_rejected(mesh):
    problem, _ = synthetic_bal(ncams=4, npnts=10, obs_per_pnt=2, seed=22,
                               pad_obs_to=4)  # 20 obs -> pad 20, not % 8
    if problem.nobs_pad % 8 == 0:
        pytest.skip("padding happened to divide")
    with pytest.raises(ValueError):
        shard_problem(problem, mesh)
