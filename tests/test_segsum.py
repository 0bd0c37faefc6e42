"""Scatter-free sorted segment sums: exactness vs the scatter path and
f32 accuracy of the compensated (double-single) scan at scale."""

import jax.numpy as jnp
import numpy as np

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.normal import assemble_blocks, seg_by_cam, seg_by_pnt
from bundleadjustment_jl_tpu.ops.segsum import (
    make_starts, prefix_sum, segment_sum_scatter, sorted_segment_sum)


def _sorted_case(n=5000, nseg=700, d=4, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, nseg, size=n))
    ids[-1] = nseg - 1  # ensure the tail belongs to the last segment
    vals = rng.normal(size=(n, d)).astype(dtype)
    starts = make_starts(ids, nseg, n)
    return jnp.asarray(vals), jnp.asarray(ids), starts, nseg


def test_sorted_matches_scatter_f64():
    vals, ids, starts, nseg = _sorted_case()
    got = sorted_segment_sum(vals, jnp.asarray(starts))
    want = segment_sum_scatter(vals, ids, nseg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_empty_segments_are_zero():
    vals, ids, starts, nseg = _sorted_case(n=50, nseg=40, seed=3)
    got = np.asarray(sorted_segment_sum(vals, jnp.asarray(starts)))
    counts = np.bincount(np.asarray(ids), minlength=nseg)
    assert (got[counts == 0] == 0).all()


def test_compensated_scan_accuracy_f32():
    """Plain f32 cumsum error grows with the global prefix magnitude; the
    compensated scan keeps per-segment sums near f32-exact even when the
    prefix is ~1e6 larger than a segment."""
    n, nseg = 200_000, 50_000
    rng = np.random.default_rng(1)
    ids = np.sort(rng.integers(0, nseg, size=n))
    ids[-1] = nseg - 1
    vals = rng.uniform(1.0, 2.0, size=(n, 1)).astype(np.float32)  # positive
    starts = jnp.asarray(make_starts(ids, nseg, n))
    exact = segment_sum_scatter(
        jnp.asarray(vals.astype(np.float64)), jnp.asarray(ids), nseg)
    comp = sorted_segment_sum(jnp.asarray(vals), starts, compensated=True)
    plain = sorted_segment_sum(jnp.asarray(vals), starts, compensated=False)
    err_comp = float(jnp.max(jnp.abs(comp.astype(jnp.float64) - exact)))
    err_plain = float(jnp.max(jnp.abs(plain.astype(jnp.float64) - exact)))
    assert err_comp < 1e-3          # ~f32 exact per segment
    assert err_comp * 10 < err_plain  # compensated is decisively better


def test_prefix_sum_compensated_matches_f64():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(100_000,)).astype(np.float32)
    ref = np.cumsum(x.astype(np.float64))
    got = np.asarray(prefix_sum(jnp.asarray(x), compensated=True),
                     dtype=np.float64)
    assert np.max(np.abs(got - ref)) < 1e-2 * np.max(np.abs(ref)) * 1e-3


def test_problem_helpers_match_scatter():
    """With SORTED_MODE forced on, the scan path must agree with scatter."""
    from bundleadjustment_jl_tpu.ops import segsum
    problem, _ = synthetic_bal(ncams=9, npnts=70, obs_per_pnt=3, seed=90)
    assert problem.pnt_starts is not None
    vals = jnp.asarray(
        np.random.default_rng(4).normal(size=(problem.nobs_pad, 5)))
    vals = vals * problem.w[:, None]
    old = segsum.SORTED_MODE
    try:
        segsum.SORTED_MODE = True
        by_pnt = seg_by_pnt(problem, vals)
        by_cam = seg_by_cam(problem, vals)
    finally:
        segsum.SORTED_MODE = old
    np.testing.assert_allclose(
        np.asarray(by_pnt),
        np.asarray(segment_sum_scatter(vals, problem.pnt_idx,
                                       problem.npnts)),
        rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(by_cam),
        np.asarray(segment_sum_scatter(vals, problem.cam_idx,
                                       problem.ncams)),
        rtol=1e-10, atol=1e-12)


def test_blocks_same_with_and_without_sorted_layout():
    from bundleadjustment_jl_tpu.ops import segsum
    problem, _ = synthetic_bal(ncams=9, npnts=70, obs_per_pnt=3, seed=91)
    stripped = problem.__class__(
        problem.cams, problem.points, problem.cam_idx, problem.pnt_idx,
        problem.pt2d, problem.w, problem.nobs, problem.name)
    old = segsum.SORTED_MODE
    try:
        segsum.SORTED_MODE = True
        b1 = assemble_blocks(problem)
    finally:
        segsum.SORTED_MODE = old
    b2 = assemble_blocks(stripped)
    for a, b in zip((b1.g_c, b1.g_p, b1.Hcc, b1.Hpp),
                    (b2.g_c, b2.g_p, b2.Hcc, b2.Hpp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)
