"""Analytic Jacobian blocks vs forward-mode AD — the role of the
reference's `src/AD.jl:32-56` cross-check (hand Jacobian vs coloring AD)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.bal import load_fixture
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.jacobian import (
    jacobian_blocks_ad, residuals_and_jacobian)
from bundleadjustment_jl_tpu.ops.residuals import residuals


@pytest.fixture(scope="module")
def synth():
    problem, _ = synthetic_bal(ncams=7, npnts=40, obs_per_pnt=3, seed=3)
    return problem


def test_analytic_matches_ad_fixture():
    problem = load_fixture()
    _, Jc, Jp = residuals_and_jacobian(problem)
    Jc_ad, Jp_ad = jacobian_blocks_ad(problem)
    np.testing.assert_allclose(Jc, Jc_ad, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(Jp, Jp_ad, rtol=1e-9, atol=1e-9)


def test_analytic_matches_ad_synthetic(synth):
    _, Jc, Jp = residuals_and_jacobian(synth)
    Jc_ad, Jp_ad = jacobian_blocks_ad(synth)
    np.testing.assert_allclose(Jc, Jc_ad, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(Jp, Jp_ad, rtol=1e-8, atol=1e-8)


def test_residuals_consistent_with_residual_op(synth):
    r, _, _ = residuals_and_jacobian(synth)
    np.testing.assert_allclose(r, residuals(synth), rtol=1e-12, atol=1e-12)


def test_padding_rows_are_zero(synth):
    r, Jc, Jp = residuals_and_jacobian(synth)
    n = synth.nobs
    assert synth.nobs_pad > n  # fixture guarantees padding exists
    assert float(jnp.abs(r[n:]).max()) == 0.0
    assert float(jnp.abs(Jc[n:]).max()) == 0.0
    assert float(jnp.abs(Jp[n:]).max()) == 0.0


def test_small_angle_branch_matches_ad():
    """Cameras with |r| ~ 0 exercise the Taylor branch; AD must agree."""
    problem, _ = synthetic_bal(ncams=4, npnts=10, obs_per_pnt=2, seed=5)
    cams = problem.cams.at[:, 0:3].set(0.0)
    cams = cams.at[1, 0:3].set(1e-14)
    _, Jc, Jp = residuals_and_jacobian(problem, cams=cams)
    Jc_ad, Jp_ad = jacobian_blocks_ad(problem, cams=cams)
    np.testing.assert_allclose(Jc, Jc_ad, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(Jp, Jp_ad, rtol=1e-8, atol=1e-8)


def test_jacobian_matches_flat_jacrev(synth):
    """Full-matrix check: blocks scattered into the flat points-first layout
    must equal jacrev of the flat residual (reference layout,
    `ReadFiles.jl:29-30`)."""
    problem = synth

    def flat_res(x):
        cams, points = problem.unflatten_state(x)
        return residuals(problem, cams, points).reshape(-1)

    x0 = problem.flatten_state()
    J_full = jax.jacrev(flat_res)(x0)  # (2*nobs_pad, nvar)

    _, Jc, Jp = residuals_and_jacobian(problem)
    n3 = 3 * problem.npnts
    for k in range(problem.nobs):
        ci = int(problem.cam_idx[k])
        pi = int(problem.pnt_idx[k])
        rows = J_full[2 * k:2 * k + 2]
        np.testing.assert_allclose(
            rows[:, 3 * pi:3 * pi + 3], Jp[k], rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            rows[:, n3 + 9 * ci:n3 + 9 * ci + 9], Jc[k], rtol=1e-8, atol=1e-10)
