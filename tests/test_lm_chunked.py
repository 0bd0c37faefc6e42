"""Chunked jit driver: checkpoint/resume, max_time, parity with one-shot.

Covers the two reference capabilities a single compiled while_loop cannot
express — the ``tired`` wall-clock stop (`reference/src/lm.jl:26,118`) and
true checkpoint/resume (SURVEY.md §6) — plus the mixed-precision
``facto_dtype`` mode (`lm.jl:99`, low-type storage `ldl_aux.jl:272-282`).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.solver.lm_jit import (
    MAX_TIME, STATUS_NAMES, levenberg_marquardt_jit,
    levenberg_marquardt_jit_chunked)


@pytest.fixture(scope="module")
def problem():
    p, _ = synthetic_bal(ncams=8, npnts=120, obs_per_pnt=4, noise_px=0.5,
                         perturb=1e-2, seed=3)
    return p


def test_chunked_matches_one_shot(problem):
    one = levenberg_marquardt_jit(problem, max_iters=40)
    chk = levenberg_marquardt_jit_chunked(problem, max_iters=40,
                                          chunk_iters=7)
    assert int(chk.iterations) == int(one.iterations)
    assert int(chk.status) == int(one.status)
    # identical program per segment -> bitwise-identical trajectory
    assert float(chk.objective) == float(one.objective)
    np.testing.assert_array_equal(np.asarray(chk.hist_obj),
                                  np.asarray(one.hist_obj))
    assert np.isfinite(chk.elapsed_time)


def test_max_time_zero_stops_immediately(problem):
    res = levenberg_marquardt_jit_chunked(problem, max_iters=40,
                                          chunk_iters=5, max_time=0.0)
    assert int(res.status) == MAX_TIME
    assert int(res.iterations) == 0
    assert STATUS_NAMES[int(res.status)] == "max_time"


def test_checkpoint_resume_continues_exactly(problem, tmp_path):
    d = str(tmp_path / "ckpt")
    full = levenberg_marquardt_jit_chunked(problem, max_iters=40,
                                           chunk_iters=5)
    # run 10 iterations, killing the "process" there
    part = levenberg_marquardt_jit_chunked(problem, max_iters=10,
                                           chunk_iters=5, checkpoint_dir=d)
    assert int(part.iterations) == 10
    assert any(f.startswith("step-") for f in os.listdir(d))
    # resume to completion
    res = levenberg_marquardt_jit_chunked(problem, max_iters=40,
                                          chunk_iters=5, checkpoint_dir=d,
                                          resume=True)
    assert int(res.iterations) == int(full.iterations)
    assert float(res.objective) == pytest.approx(float(full.objective),
                                                 rel=1e-10)
    assert int(res.status) == int(full.status)


def test_callback_reports_progress(problem):
    seen = []
    levenberg_marquardt_jit_chunked(problem, max_iters=12, chunk_iters=4,
                                    callback=seen.append)
    assert seen and seen[-1]["iter"] <= 12
    assert all("obj" in row and "lam" in row for row in seen)


def test_facto_dtype_bf16_converges_near_f32(problem):
    p32 = problem.astype(jnp.float32)
    kw = dict(max_iters=60, lam0_mode="diag", satol=0.0, srtol=0.0,
              atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4)
    base = levenberg_marquardt_jit(p32, **kw)
    mixed = levenberg_marquardt_jit(p32, facto_dtype=jnp.bfloat16, **kw)
    assert STATUS_NAMES[int(mixed.status)] != "exception"
    # bf16 factorization storage must reach the f32 objective within ~1%
    assert float(mixed.objective) == pytest.approx(
        float(base.objective), rel=2e-2)


def test_facto_dtype_f16_converges_near_f32(problem):
    """f16 W storage with the range-equilibration scale (the heir of the
    reference's ``normalize_F16!``, `lma_aux.jl:27-52`)."""
    p32 = problem.astype(jnp.float32)
    kw = dict(max_iters=60, lam0_mode="diag", satol=0.0, srtol=0.0,
              atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4)
    base = levenberg_marquardt_jit(p32, **kw)
    mixed = levenberg_marquardt_jit(p32, facto_dtype=jnp.float16, **kw)
    assert STATUS_NAMES[int(mixed.status)] != "exception"
    assert float(mixed.objective) == pytest.approx(
        float(base.objective), rel=2e-2)


def test_facto_dtype_f16_survives_w_overflow(problem):
    """Scale focal and observations by 16 (an exact problem
    transformation: the projection is linear in f): max|W| ~ f^2 rises
    past f16's 65504 max, so a raw cast would silently inf — the
    power-of-two range scale must keep the solve finite and convergent."""
    import dataclasses
    p32 = problem.astype(jnp.float32)
    s = jnp.float32(16.0)
    cams = p32.cams.at[:, 8].mul(s)
    big = dataclasses.replace(p32, cams=cams, pt2d=p32.pt2d * s)

    from bundleadjustment_jl_tpu.ops.normal import assemble_blocks
    from bundleadjustment_jl_tpu.solver.lm_jit import _maybe_cast_facto
    blocks = assemble_blocks(big)
    assert float(jnp.max(jnp.abs(blocks.W_f))) > 65504.0  # raw cast infs
    cast = _maybe_cast_facto(blocks, jnp.float16)
    assert bool(jnp.all(jnp.isfinite(
        cast.W_f.astype(jnp.float32))))
    sc = float(cast.w_scale)
    assert sc < 1.0 and (sc == 2.0 ** round(np.log2(sc)))  # power of two
    # scaled storage round-trips to W within f16 relative accuracy
    np.testing.assert_allclose(
        np.asarray(cast.W_f.astype(jnp.float32)) / sc,
        np.asarray(blocks.W_f, dtype=np.float32), rtol=2e-3, atol=1e-3)

    kw = dict(max_iters=60, lam0_mode="diag", satol=0.0, srtol=0.0,
              atol=0.0, rtol=1e-5, oatol=0.0, ortol=1e-4)
    base = levenberg_marquardt_jit(big, **kw)
    mixed = levenberg_marquardt_jit(big, facto_dtype=jnp.float16, **kw)
    assert STATUS_NAMES[int(mixed.status)] != "exception"
    assert jnp.isfinite(mixed.objective)
    # objective scales by s^2 vs the unscaled problem; compare to its
    # own f32 run — f16 storage must stay within ~1%
    assert float(mixed.objective) == pytest.approx(
        float(base.objective), rel=2e-2)


def test_unknown_option_raises(problem):
    with pytest.raises(TypeError):
        levenberg_marquardt_jit_chunked(problem, bogus_option=1)
