"""Gather-free row-indexing formulations (ops/gatherfree.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops import gatherfree
from bundleadjustment_jl_tpu.ops.gatherfree import (
    expand_sorted, take_rows_onehot)


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    gatherfree.set_mode("native")


def test_onehot_gather_is_exact_f32():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((137, 9)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 137, size=5000), jnp.int32)
    out = take_rows_onehot(table, idx, chunk=1024)  # exercises lax.map
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])


def test_onehot_gather_is_exact_f64():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((53, 3)))
    idx = jnp.asarray(rng.integers(0, 53, size=300), jnp.int32)
    out = take_rows_onehot(table, idx)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])


def test_expand_sorted_matches_gather():
    rng = np.random.default_rng(2)
    npnts, total = 200, 1024
    idx = np.sort(rng.integers(0, npnts, size=900))
    starts = np.searchsorted(idx, np.arange(npnts + 1)).astype(np.int32)
    starts[-1] = total  # padded tail
    table = rng.standard_normal((npnts, 3))
    out = np.asarray(expand_sorted(jnp.asarray(table),
                                   jnp.asarray(starts), total))
    # valid rows reproduce the gather to fp-accumulation accuracy
    np.testing.assert_allclose(out[:900], table[idx], rtol=0, atol=1e-12)


def test_expand_sorted_handles_empty_segments():
    # points 0 and 2 empty; telescoping deltas must still land right
    table = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
    starts = jnp.asarray([0, 0, 2, 2, 4], jnp.int32)
    out = np.asarray(expand_sorted(table, starts, 4))
    np.testing.assert_allclose(out[:, 0], [2.0, 2.0, 4.0, 4.0],
                               atol=1e-12)


def test_solver_parity_under_gatherfree_mode():
    from bundleadjustment_jl_tpu.solver.lm_jit import (
        levenberg_marquardt_jit)

    p, _ = synthetic_bal(ncams=8, npnts=120, obs_per_pnt=4, noise_px=0.5,
                         perturb=1e-2, seed=11)
    base = levenberg_marquardt_jit(p, max_iters=30)
    gatherfree.set_mode("gatherfree")
    alt = levenberg_marquardt_jit(p, max_iters=30)
    assert int(alt.status) == int(base.status)
    assert float(alt.objective) == pytest.approx(float(base.objective),
                                                 rel=1e-8)
    assert abs(int(alt.iterations) - int(base.iterations)) <= 1
