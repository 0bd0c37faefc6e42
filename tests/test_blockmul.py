"""Padding-free block products vs reference einsums — both size paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_jl_tpu.ops import blockmul as bm


@pytest.fixture(scope="module")
def arrs():
    rng = np.random.default_rng(0)
    n = 257
    return {
        "W": jnp.asarray(rng.normal(size=(n, 9, 3))),
        "Jc": jnp.asarray(rng.normal(size=(n, 2, 9))),
        "Jp": jnp.asarray(rng.normal(size=(n, 2, 3))),
        "t3": jnp.asarray(rng.normal(size=(n, 3))),
        "v9": jnp.asarray(rng.normal(size=(n, 9))),
        "r2": jnp.asarray(rng.normal(size=(n, 2))),
    }


@pytest.fixture(scope="module", params=["small", "large"])
def path(request):
    """Run every check through both the einsum and the elementwise path."""
    old = bm.SMALL_N
    bm.SMALL_N = (1 << 18) if request.param == "small" else 0
    yield request.param
    bm.SMALL_N = old


def test_w_products(arrs, path):
    W = arrs["W"]
    np.testing.assert_allclose(
        np.asarray(bm.w_dot_b(W.reshape(-1), arrs["t3"])),
        np.asarray(jnp.einsum("kab,kb->ka", W, arrs["t3"])),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bm.wT_dot_a(W.reshape(-1), arrs["v9"])),
        np.asarray(jnp.einsum("kab,ka->kb", W, arrs["v9"])),
        rtol=1e-12, atol=1e-12)


def test_jacobian_products(arrs, path):
    Jc, Jp = arrs["Jc"], arrs["Jp"]
    np.testing.assert_allclose(
        np.asarray(bm.jc_dot(Jc.reshape(-1), arrs["v9"])),
        np.asarray(jnp.einsum("kia,ka->ki", Jc, arrs["v9"])),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bm.jcT_dot(Jc.reshape(-1), arrs["r2"])),
        np.asarray(jnp.einsum("kia,ki->ka", Jc, arrs["r2"])),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bm.jp_dot(Jp.reshape(-1), arrs["t3"])),
        np.asarray(jnp.einsum("kib,kb->ki", Jp, arrs["t3"])),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bm.jpT_dot(Jp.reshape(-1), arrs["r2"])),
        np.asarray(jnp.einsum("kib,ki->kb", Jp, arrs["r2"])),
        rtol=1e-12, atol=1e-12)


def test_outer_products(arrs, path):
    Jc, Jp = arrs["Jc"], arrs["Jp"]
    np.testing.assert_allclose(
        np.asarray(bm.jjT_outer(Jc.reshape(-1), 9, Jp.reshape(-1), 3)),
        np.asarray(jnp.einsum("kia,kib->kab", Jc, Jp).reshape(-1, 27)),
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bm.jjT_outer(Jc.reshape(-1), 9, Jc.reshape(-1), 9)),
        np.asarray(jnp.einsum("kia,kib->kab", Jc, Jc).reshape(-1, 81)),
        rtol=1e-12, atol=1e-12)
