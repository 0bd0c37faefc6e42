"""Golden-value tests for the camera model against the reference fixture
(`/root/reference/test/runtests.jl:4-27`)."""

import jax
import jax.numpy as jnp
import numpy as np

from bundleadjustment_jl_tpu.io.bal import FIXTURE_TRUE_RESIDUALS, load_fixture
from bundleadjustment_jl_tpu.models.camera import (
    distortion_factor, project, rodrigues_rotate)
from bundleadjustment_jl_tpu.ops.residuals import objective, residuals


def test_rodrigues_golden():
    # `runtests.jl:6`: Rodrigues_rotation([1,1,1], [2.5,-0.3,1.0])
    out = rodrigues_rotate(jnp.array([1.0, 1.0, 1.0]),
                           jnp.array([2.5, -0.3, 1.0]))
    expected = np.array([1.577353756980212, 2.1408840848258484,
                         -0.5182378418060594])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=0, atol=1e-13)


def test_rodrigues_small_angle():
    X = jnp.array([2.5, -0.3, 1.0])
    out0 = rodrigues_rotate(jnp.zeros(3), X)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(X), atol=1e-15)
    # Continuity across the small-angle switch.
    r = jnp.array([1e-13, -2e-13, 5e-14])
    out_small = rodrigues_rotate(r, X)
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(X), atol=1e-10)
    # Gradient is finite at exactly zero (the reference NaNs here,
    # cf. disabled branch BALNLPModels.jl:20-27).
    g = jax.jacfwd(rodrigues_rotate)(jnp.zeros(3), X)
    assert np.all(np.isfinite(np.asarray(g)))


def test_scaling_factor_golden():
    # `runtests.jl:7`: scaling_factor([1 1], 1, 1) == 7
    out = distortion_factor(jnp.array([1.0, 1.0]), jnp.array(1.0),
                            jnp.array(1.0))
    assert float(out) == 7.0


def test_projection_golden():
    # `runtests.jl:8`: projection(x=(1,1,1), r=(1,1,1), t=(0,0,0),
    # k1=k2=f=1) == [-7, -7]
    cam = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    X = jnp.array([1.0, 1.0, 1.0])
    out = project(cam, X)
    np.testing.assert_allclose(np.asarray(out), [-7.0, -7.0], atol=1e-12)


def test_fixture_residuals_golden():
    # `runtests.jl:15-27`: 5-obs mini problem, exact residual match.
    problem = load_fixture()
    r = np.asarray(residuals(problem))
    np.testing.assert_allclose(r[:5], FIXTURE_TRUE_RESIDUALS, rtol=0,
                               atol=1e-10)
    # Padded rows are exactly zero.
    assert np.all(r[5:] == 0.0)


def test_objective_matches_residuals():
    problem = load_fixture()
    r = np.asarray(residuals(problem))
    obj = float(objective(problem))
    np.testing.assert_allclose(obj, 0.5 * np.sum(r ** 2), rtol=1e-14)


def test_projection_zero_depth_guard():
    # Point exactly on the camera plane: finite output and derivatives
    # (the reference produces NaN and zeroes it, BALNLPModels.jl:199-201).
    cam = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    X = jnp.array([1.0, 1.0, 0.0])
    out = project(cam, X)
    assert np.all(np.isfinite(np.asarray(out)))
    J = jax.jacfwd(project, argnums=(0, 1))(cam, X)
    for block in J:
        assert np.all(np.isfinite(np.asarray(block)))
