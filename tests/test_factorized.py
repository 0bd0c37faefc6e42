"""Parity of the digit-factorized one-hot kernels (round 5) against the
flat one-hot formulations, and the f16-as-u16 storage decode.

The factorized kernels (`pallas_schur._fac_scatter`/`_fac_gather`,
`BA_FACTOR=1` default) must be EXACT rearrangements of the flat
kernels' math.  These tests pin that in interpret mode with the bf16
split disabled (`SPLIT3_CLASSES` empty): on hardware the 3-term bf16
split is exact (MXU f32 accumulation), but the CPU interpreter's bf16
dots introduce ~2e-3 noise that would mask real layout bugs — with the
split off, fac vs flat must agree to f32 reassociation level (~1e-6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bundleadjustment_jl_tpu.ops import pallas_schur as ps


@pytest.fixture(scope="module")
def rig():
    """Random point-sorted problem arrays at one-hot-stressing sizes."""
    rng = np.random.default_rng(0)
    npnts, ncams, n = 700, 37, 4096
    pnt = np.sort(rng.integers(0, npnts, n))
    pnt[-1] = npnts - 1                      # pin nseg
    cam = rng.integers(0, ncams, n)
    W = rng.normal(size=(32, n)).astype(np.float32)
    W[27:] = 0
    starts = np.searchsorted(pnt, np.arange(npnts + 1)).astype(np.int32)
    perm = np.argsort(cam, kind="stable")
    return dict(
        npnts=npnts, ncams=ncams, n=n,
        pnt=jnp.asarray(pnt), cam=jnp.asarray(cam), W=jnp.asarray(W),
        starts=jnp.asarray(starts),
        bounds=ps.tile_bounds(jnp.asarray(starts), npnts),
        v=jnp.asarray(rng.normal(size=(ncams, 9)).astype(np.float32)),
        hpp=jnp.asarray(rng.normal(size=(npnts * 9,)).astype(np.float32)),
        gp=jnp.asarray(rng.normal(size=(npnts * 3,)).astype(np.float32)),
        W_cam=jnp.asarray(W[:, perm]),
        cam_sorted=jnp.asarray(cam[perm]),
        cstarts=jnp.asarray(np.searchsorted(
            cam[perm], np.arange(ncams + 1)).astype(np.int32)),
        x8=jnp.asarray(rng.normal(size=(8, n)).astype(np.float32)),
    )


@pytest.fixture(autouse=True)
def _interpret_nosplit(monkeypatch):
    monkeypatch.setattr(ps, "INTERPRET", True)
    monkeypatch.setattr(ps, "SPLIT3_CLASSES", frozenset())
    yield


def _ab(fn):
    """Run ``fn`` with FACTOR off (flat) and on (factorized)."""
    old = ps.FACTOR
    try:
        ps.FACTOR = False
        a = np.asarray(fn())
        ps.FACTOR = True
        b = np.asarray(fn())
    finally:
        ps.FACTOR = old
    return a, b


def _close(a, b, tol=1e-5):
    np.testing.assert_allclose(a, b, rtol=tol,
                               atol=tol * max(1.0, np.abs(a).max()))


def test_fused_matvec_fac_matches_flat(rig):
    a, b = _ab(lambda: ps.matvec_cam_scatter(
        rig["W"], rig["v"], rig["cam"], rig["pnt"], rig["hpp"],
        rig["bounds"], rig["ncams"], rig["npnts"]))
    _close(a, b)


def test_fused_backsub_fac_matches_flat(rig):
    def run():
        out, dp8 = ps.matvec_cam_scatter(
            rig["W"], rig["v"], rig["cam"], rig["pnt"], rig["hpp"],
            rig["bounds"], rig["ncams"], rig["npnts"],
            gp_f=rig["gp"], sign=-1.0, with_dp=True)
        return jnp.concatenate([out.reshape(-1),
                                dp8[:3, :rig["npnts"]].reshape(-1)])
    a, b = _ab(run)
    _close(a, b)


@pytest.mark.parametrize("variant", ["plain", "fold", "fold_add", "k8"])
def test_wtv_point_reduce_fac_matches_flat(rig, variant):
    kw = {}
    if variant in ("fold", "fold_add", "k8"):
        kw["hpp_inv_f"] = rig["hpp"]
    if variant == "fold_add":
        kw.update(add_gp=rig["gp"], sign=-1.0)
    if variant == "k8":
        kw["out_k8"] = True
    a, b = _ab(lambda: ps.wtv_point_reduce(
        rig["W"], rig["v"], rig["pnt"], rig["cam"], rig["starts"],
        rig["npnts"], **kw))
    _close(a, b)


def test_wtv_pregather_branch_fac_matches_flat(rig, monkeypatch):
    monkeypatch.setattr(ps, "GATHER_TABLE_MAX_CAMS", 1)  # force pre-gather
    a, b = _ab(lambda: ps.wtv_point_reduce(
        rig["W"], rig["v"], rig["pnt"], rig["cam"], rig["starts"],
        rig["npnts"], hpp_inv_f=rig["hpp"], out_k8=True))
    _close(a, b)


def test_wt_cam_reduce_fac_matches_flat(rig):
    a, b = _ab(lambda: ps.wt_cam_reduce(
        rig["W_cam"], rig["x8"], rig["cam_sorted"], rig["cstarts"],
        rig["ncams"]))
    _close(a, b)


def test_cam_scatter_reduce_fac_matches_flat(rig):
    a, b = _ab(lambda: ps.cam_scatter_reduce(
        rig["W"], rig["cam"], rig["bounds"], rig["ncams"], d_out=9,
        prod=ps._prod_w_op, idx_row=rig["pnt"],
        op_t=rig["x8"][:, :rig["npnts"]]))
    _close(a, b)


def test_jtj_pnt_reduce_fac_matches_flat(rig):
    JR = jnp.asarray(np.random.default_rng(3).normal(
        size=(32, rig["n"])).astype(np.float32))
    a, b = _ab(lambda: ps.jtj_pnt_reduce(
        JR, rig["pnt"], rig["starts"], rig["npnts"]))
    _close(a, b)


def test_f16_decode_exact():
    """u16 bit-pattern decode == numpy's f16 -> f32 widening, including
    subnormals, signed zero and extremes of the f16 range."""
    vals = np.array([0.0, -0.0, 1.0, -1.5, 65504.0, -65504.0, 6.1e-5,
                     5.96e-8, -5.96e-8, 3.1e-5, -2.4e-7, 0.333, 1e-6],
                    np.float16)
    u = jnp.asarray(vals.view(np.uint16))
    got = np.asarray(ps._f16_decode(u.reshape(1, -1))).ravel()
    exp = vals.astype(np.float32)
    assert (got == exp).all(), (got, exp)


def test_f16_storage_rides_fused_matvec(rig):
    """An f16-stored W routed through the kernels as u16 bits matches
    the f32 flat matvec to f16 rounding."""
    ps.FACTOR = True
    W16 = rig["W"].astype(jnp.float16)
    got = np.asarray(ps.matvec_cam_scatter(
        W16, rig["v"], rig["cam"], rig["pnt"], rig["hpp"],
        rig["bounds"], rig["ncams"], rig["npnts"]))
    ref = np.asarray(ps.matvec_cam_scatter(
        W16.astype(jnp.float32), rig["v"], rig["cam"], rig["pnt"],
        rig["hpp"], rig["bounds"], rig["ncams"], rig["npnts"]))
    _close(ref, got, tol=1e-4)   # identical W values -> reassociation only


@pytest.mark.parametrize("npnts,ncams,n", [
    (5, 1, 128),        # fewer segments than one lo digit
    (17, 3, 256),       # nhi = 1 everywhere
    (513, 7, 1024),     # one past a tile boundary
    (511, 513, 2048),   # more cameras than points
])
def test_fac_edge_shapes(npnts, ncams, n):
    """Factorized == flat on degenerate shapes (tiny/uneven segment
    counts, nhi = 1, partial tiles)."""
    rng = np.random.default_rng(npnts * 1000 + ncams)
    pnt = np.sort(rng.integers(0, npnts, n))
    pnt[-1] = npnts - 1
    cam = rng.integers(0, ncams, n)
    W = rng.normal(size=(32, n)).astype(np.float32)
    W[27:] = 0
    starts = np.searchsorted(pnt, np.arange(npnts + 1)).astype(np.int32)
    bounds = ps.tile_bounds(jnp.asarray(starts), npnts)
    v = jnp.asarray(rng.normal(size=(ncams, 9)).astype(np.float32))
    hpp = jnp.asarray(rng.normal(size=(npnts * 9,)).astype(np.float32))
    gp = jnp.asarray(rng.normal(size=(npnts * 3,)).astype(np.float32))
    args = (jnp.asarray(W), v, jnp.asarray(cam), jnp.asarray(pnt), hpp,
            bounds, ncams, npnts)
    a, b = _ab(lambda: ps.matvec_cam_scatter(
        *args, gp_f=gp, sign=-1.0, with_dp=True)[0])
    _close(a, b)
