"""Solver checkpoint / resume.

The reference's only resume mechanism is warm-starting via the ``x`` kwarg
(`/root/reference/src/lm.jl:18`, used by the precision cascades
`benchmark_diffprec.jl:46-53`) — nothing survives a process death. Here LM
state (cams, points, lambda, iteration, stats) persists to disk atomically
(write-to-temp + rename) so Final-scale multi-hour runs resume exactly.

Format: a single ``.npz`` per checkpoint + JSON metadata — host-side,
framework-free, readable anywhere. A :class:`CheckpointManager` rotates
``step-<n>.npz`` files and keeps the newest K.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import numpy as np


def save_checkpoint(path: str, cams, points, *, lam: float = 0.0,
                    iteration: int = 0, meta: Optional[dict] = None) -> None:
    """Atomically write one checkpoint file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "cams": np.asarray(cams),
        "points": np.asarray(points),
        "lam": np.asarray(lam, np.float64),
        "iteration": np.asarray(iteration, np.int64),
        "meta_json": np.asarray(json.dumps(meta or {})),
    }
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {
            "cams": z["cams"],
            "points": z["points"],
            "lam": float(z["lam"]),
            "iteration": int(z["iteration"]),
            "meta": json.loads(str(z["meta_json"])),
        }


def latest_checkpoint(directory: str) -> Optional[str]:
    """Newest ``step-<n>.npz`` in a checkpoint directory (by step number)."""
    if not os.path.isdir(directory):
        return None
    best, best_n = None, -1
    for f in os.listdir(directory):
        if f.startswith("step-") and f.endswith(".npz"):
            try:
                n = int(f[5:-4])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(directory, f), n
    return best


class CheckpointManager:
    """Rotating checkpoints: save every ``every`` iterations, keep ``keep``."""

    def __init__(self, directory: str, every: int = 10, keep: int = 3):
        self.directory = directory
        self.every = max(1, every)
        self.keep = max(1, keep)
        os.makedirs(directory, exist_ok=True)

    def maybe_save(self, iteration: int, cams, points, *, lam: float = 0.0,
                   meta: Optional[dict] = None) -> Optional[str]:
        if iteration % self.every != 0:
            return None
        path = os.path.join(self.directory, f"step-{iteration}.npz")
        save_checkpoint(path, cams, points, lam=lam, iteration=iteration,
                        meta=meta)
        self._rotate()
        return path

    def _rotate(self) -> None:
        files = sorted(
            (f for f in os.listdir(self.directory)
             if f.startswith("step-") and f.endswith(".npz")),
            key=lambda f: int(f[5:-4]))
        for f in files[:-self.keep]:
            os.unlink(os.path.join(self.directory, f))

    def restore_latest(self) -> Optional[dict]:
        path = latest_checkpoint(self.directory)
        return load_checkpoint(path) if path else None
