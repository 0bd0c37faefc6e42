"""BAL reader/writer round-trip and synthetic generator tests."""

import numpy as np

from bundleadjustment_jl_tpu.io.bal import read_bal, write_bal
from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.ops.residuals import objective, residuals


def test_synthetic_zero_noise_is_optimal():
    problem, truth = synthetic_bal(ncams=5, npnts=40, obs_per_pnt=3,
                                   noise_px=0.0, perturb=0.0, seed=1,
                                   pad_obs_to=8)
    assert truth["objective"] == 0.0
    assert float(objective(problem)) < 1e-16


def test_synthetic_consistency():
    problem, truth = synthetic_bal(ncams=6, npnts=50, obs_per_pnt=3,
                                   noise_px=0.5, perturb=1e-3, seed=2,
                                   pad_obs_to=8)
    # numpy oracle in the generator agrees with the JAX residual path at the
    # ground-truth state.
    obj_truth = float(objective(problem, cams=problem.cams * 0 +
                                np.asarray(truth["cams"]),
                                points=problem.points * 0 +
                                np.asarray(truth["points"])))
    np.testing.assert_allclose(obj_truth, truth["objective"], rtol=1e-10)
    # Every camera observes something (needed for a nonsingular camera block)
    seen = np.unique(np.asarray(problem.cam_idx[problem.w > 0]))
    assert seen.size == problem.ncams


def test_synthetic_cam_window_locality():
    """Covisibility-locality mode: BAL invariants hold (unique (cam, pnt)
    pairs, every camera observed) and point-sorted tiles reference far
    fewer distinct cameras than the uniform sampler — the structure real
    BAL files (trajectories, landmark clusters) actually have."""
    import numpy as np
    kw = dict(ncams=64, npnts=2048, obs_per_pnt=4, noise_px=0.5,
              perturb=1e-2, seed=3)
    uni, _ = synthetic_bal(**kw)
    loc, _ = synthetic_bal(cam_window=8, **kw)
    for p in (uni, loc):
        n = p.nobs
        pairs = set(zip(np.asarray(p.cam_idx[:n]).tolist(),
                        np.asarray(p.pnt_idx[:n]).tolist()))
        assert len(pairs) == n                       # unique (cam, pnt)
        assert len(set(np.asarray(p.cam_idx[:n]).tolist())) == 64

    def mean_tile_cams(p, tile_pnts=256):
        n = p.nobs
        ci = np.asarray(p.cam_idx[:n])
        pi = np.asarray(p.pnt_idx[:n])
        counts = [len(set(ci[(pi >= lo) & (pi < lo + tile_pnts)].tolist()))
                  for lo in range(0, 2048, tile_pnts)]
        return float(np.mean(counts))

    assert mean_tile_cams(loc) < 0.5 * mean_tile_cams(uni)

    # and the solver converges on the banded problem
    from bundleadjustment_jl_tpu.solver.lm_jit import (
        STATUS_NAMES, levenberg_marquardt_jit)
    res = levenberg_marquardt_jit(loc, max_iters=40)
    assert STATUS_NAMES[int(res.status)] != "exception"
    nequ = 2 * loc.nobs
    assert (2 * float(res.objective) / nequ) ** 0.5 < 1.0  # ~noise floor


def test_bal_roundtrip(tmp_path):
    problem, _ = synthetic_bal(ncams=4, npnts=20, obs_per_pnt=3,
                               seed=3, pad_obs_to=8)
    for suffix in (".txt", ".txt.bz2"):
        path = str(tmp_path / f"roundtrip{suffix}")
        write_bal(path, problem)
        back = read_bal(path, pad_obs_to=8)
        np.testing.assert_allclose(np.asarray(back.cams),
                                   np.asarray(problem.cams), rtol=1e-14)
        np.testing.assert_allclose(np.asarray(back.points),
                                   np.asarray(problem.points), rtol=1e-14)
        np.testing.assert_array_equal(np.asarray(back.cam_idx),
                                      np.asarray(problem.cam_idx))
        np.testing.assert_array_equal(np.asarray(back.pnt_idx),
                                      np.asarray(problem.pnt_idx))
        r0 = np.asarray(residuals(problem))
        r1 = np.asarray(residuals(back))
        np.testing.assert_allclose(r1, r0, atol=1e-5)


def test_flatten_unflatten_roundtrip():
    problem, _ = synthetic_bal(ncams=3, npnts=10, obs_per_pnt=2, seed=4,
                               pad_obs_to=8)
    x = problem.flatten_state()
    assert x.shape == (problem.nvar,)
    cams, points = problem.unflatten_state(x)
    np.testing.assert_array_equal(np.asarray(cams), np.asarray(problem.cams))
    np.testing.assert_array_equal(np.asarray(points),
                                  np.asarray(problem.points))


def test_reader_rejects_truncated_file(tmp_path):
    """Malformed BAL input fails loudly, not silently (the reference would
    throw a parse error mid-stream; both readers must too)."""
    import pytest
    from bundleadjustment_jl_tpu.io.bal import read_bal, write_bal, load_fixture
    src = str(tmp_path / "trunc.txt")
    write_bal(src, load_fixture())
    text = open(src).read().splitlines()
    open(src, "w").write("\n".join(text[:-5]))  # drop trailing values
    with pytest.raises(Exception):
        read_bal(src)


def test_reader_rejects_missing_file():
    import pytest
    from bundleadjustment_jl_tpu.io.bal import read_bal
    with pytest.raises(Exception):
        read_bal("/nonexistent/problem-1-1-pre.txt")
