"""Checkpoint/resume + profiling utilities."""

import os

import numpy as np

from bundleadjustment_jl_tpu.io.synthetic import synthetic_bal
from bundleadjustment_jl_tpu.solver.lm import LMOptions, levenberg_marquardt
from bundleadjustment_jl_tpu.utils.checkpoint import (
    CheckpointManager, latest_checkpoint, load_checkpoint, save_checkpoint)
from bundleadjustment_jl_tpu.utils.profiling import PhaseTimers


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    cams = np.random.default_rng(0).normal(size=(3, 9))
    pnts = np.random.default_rng(1).normal(size=(7, 3))
    save_checkpoint(path, cams, pnts, lam=2.5, iteration=12,
                    meta={"objective": 1.5})
    state = load_checkpoint(path)
    np.testing.assert_array_equal(state["cams"], cams)
    np.testing.assert_array_equal(state["points"], pnts)
    assert state["lam"] == 2.5
    assert state["iteration"] == 12
    assert state["meta"]["objective"] == 1.5


def test_manager_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path), every=2, keep=2)
    cams = np.zeros((2, 9))
    pnts = np.zeros((3, 3))
    saved = [mgr.maybe_save(i, cams, pnts) for i in range(1, 9)]
    assert sum(s is not None for s in saved) == 4  # iters 2,4,6,8
    files = sorted(os.listdir(str(tmp_path)))
    assert files == ["step-6.npz", "step-8.npz"]
    assert latest_checkpoint(str(tmp_path)).endswith("step-8.npz")


def test_lm_checkpoint_and_resume(tmp_path):
    """Kill-and-resume: a fresh driver continues from the saved state."""
    problem, _ = synthetic_bal(ncams=6, npnts=50, obs_per_pnt=3,
                               noise_px=0.3, perturb=1e-2, seed=60)
    ckdir = str(tmp_path / "ck")
    # phase 1: run 6 iterations, checkpoint every 2
    res1 = levenberg_marquardt(problem, LMOptions(
        solver="dense", max_iters=6, checkpoint_dir=ckdir,
        checkpoint_every=2,
        atol=0.0, rtol=0.0, oatol=0.0, ortol=0.0, satol=0.0, srtol=0.0))
    assert latest_checkpoint(ckdir) is not None
    state = load_checkpoint(latest_checkpoint(ckdir))
    assert state["iteration"] > 0
    # phase 2: resume; must pick up where phase 1 checkpointed and finish
    res2 = levenberg_marquardt(problem, LMOptions(
        solver="dense", max_iters=60, checkpoint_dir=ckdir, resume=True))
    assert res2.solved(), res2.status
    assert res2.objective <= res1.objective + 1e-9


def test_phase_timers():
    timers = PhaseTimers(sync=False)
    with timers.phase("a"):
        sum(range(1000))
    timers.timed("b", lambda: sum(range(1000)))
    with timers.phase("a"):
        pass
    assert timers.counts["a"] == 2
    assert timers.counts["b"] == 1
    s = timers.summary()
    assert "a" in s and "b" in s and "%" in s
