"""End-to-end drill on a committed BAL file: parse -> model -> solve.

The 5-observation golden fixture (`io/bal.py:load_fixture`, from
`reference/test/runtests.jl:15-27`) pins kernel semantics but never
exercises the full file pipeline at a realistic size. This committed
mid-size BAL file (24 cams / 800 pnts / 4000 obs, written by `write_bal`
from a seeded synthetic problem) drives the exact path a real BAL download
takes — bz2 text file -> reader (both the Python and the native C parser)
-> padded problem -> full jit LM solve — keeping the repo one
`scripts/get_data.py` away from real-data parity
(`reference/src/ReadFiles.jl:9-53` semantics).
"""

import os

import numpy as np
import pytest

_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "problem-24-800-pre.txt.bz2")

# Generation parameters (seed 42, noise 1 px, perturb 2e-2 — see module
# docstring); statistical optimum ~ 0.5 * (nequ - nvar) * sigma^2.
_NCAMS, _NPNTS, _NOBS = 24, 800, 4000


def test_fixture_reads_consistently():
    from bundleadjustment_jl_tpu.io.bal import read_bal

    p = read_bal(_FIXTURE)
    assert (p.ncams, p.npnts, p.nobs) == (_NCAMS, _NPNTS, _NOBS)
    # padded tail is zero-weighted
    w = np.asarray(p.w)
    assert w[:p.nobs].min() == 1.0 and (w[p.nobs:] == 0).all()


def test_native_parser_matches_python_reader():
    from bundleadjustment_jl_tpu.io.bal import read_bal
    from bundleadjustment_jl_tpu.io.native import parse_bal_native

    try:
        cam_idx, pnt_idx, pt2d, cams_file, points = parse_bal_native(
            _FIXTURE)
    except (OSError, RuntimeError) as e:   # no compiler in exotic envs
        pytest.skip(f"native parser unavailable: {e}")
    assert (cams_file.shape, points.shape, cam_idx.shape) == (
        (_NCAMS, 9), (_NPNTS, 3), (_NOBS,))
    p = read_bal(_FIXTURE)
    # native output is file-ordered; the reader sorts by point. Compare as
    # sorted multisets of (cam, pnt, x, y) rows.
    nat = np.column_stack([cam_idx, pnt_idx, pt2d])
    py = np.column_stack([
        np.asarray(p.cam_idx[:p.nobs]), np.asarray(p.pnt_idx[:p.nobs]),
        np.asarray(p.pt2d[:p.nobs])])
    nat = nat[np.lexsort(nat.T[::-1])]
    py = py[np.lexsort(py.T[::-1])]
    np.testing.assert_allclose(nat, py, rtol=0, atol=1e-12)
    # cams reorder: file (r, t, f, k1, k2) -> internal (r, t, k1, k2, f)
    internal = np.asarray(p.cams)
    np.testing.assert_allclose(internal[:, 0:6], cams_file[:, 0:6])
    np.testing.assert_allclose(internal[:, 8], cams_file[:, 6])   # f
    np.testing.assert_allclose(internal[:, 6], cams_file[:, 7])   # k1
    np.testing.assert_allclose(internal[:, 7], cams_file[:, 8])   # k2


def test_fixture_solves_to_statistical_optimum():
    from bundleadjustment_jl_tpu.io.bal import read_bal
    from bundleadjustment_jl_tpu.solver.lm_jit import (
        levenberg_marquardt_jit)

    p = read_bal(_FIXTURE)
    res = levenberg_marquardt_jit(p, max_iters=60, lam0_mode="diag",
                                  satol=0.0, srtol=0.0, atol=0.0,
                                  rtol=1e-6, oatol=0.0, ortol=1e-5)
    obj = float(res.objective)
    nequ, nvar = 2 * p.nobs, p.nvar
    expected = 0.5 * (nequ - nvar)   # sigma = 1 px
    # solved well below the noise floor at the truth (~0.5*nequ) and within
    # 15% of the chi-square expectation
    assert obj < 0.5 * nequ
    assert obj == pytest.approx(expected, rel=0.15)
    assert res.status_name() in ("first_order", "small_obj_change",
                                 "small_residual")
