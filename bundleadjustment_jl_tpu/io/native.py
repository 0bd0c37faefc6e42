"""ctypes bindings for the native C++ BAL parser (`csrc/bal_parser.cpp`).

Compiled lazily with g++ on first use (cached next to the package); links
libbz2 when available so .bz2 files parse natively too. Falls back cleanly
— `io/bal.py` only uses :func:`parse_bal_native` when the import succeeds.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "bal_parser.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_bal_native.so")


def _find_libbz2() -> str | None:
    """Path of a linkable libbz2 (runtime images often ship only the
    versioned .so, so -lbz2 alone may not resolve)."""
    for d in ("/usr/lib", "/usr/lib/x86_64-linux-gnu", "/usr/local/lib",
              sysconfig.get_config_var("LIBDIR") or ""):
        if not d:
            continue
        for name in ("libbz2.so", "libbz2.so.1.0", "libbz2.so.1"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
    return None


_LIBBZ2 = _find_libbz2()


def _build() -> str:
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_CSRC)):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", _CSRC, "-o", _SO]
    if _LIBBZ2 is not None:
        cmd.insert(1, "-DBAL_HAVE_BZ2")
        cmd.append(_LIBBZ2)
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


_lib = ctypes.CDLL(_build())
_lib.bal_read_header.restype = ctypes.c_int
_lib.bal_read_header.argtypes = [ctypes.c_char_p] + \
    [ctypes.POINTER(ctypes.c_int64)] * 3
_lib.bal_parse.restype = ctypes.c_int
_lib.bal_parse.argtypes = [
    ctypes.c_char_p,
    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
]

NATIVE_BZ2 = _LIBBZ2 is not None


def parse_bal_native(path: str):
    """Parse a BAL file via the native library.

    Returns ``(cam_idx, pnt_idx, pt2d, cams_file, points)`` with cameras in
    *file* order (r, t, f, k1, k2) — same contract as
    ``io.bal._read_raw``.
    """
    nc = ctypes.c_int64()
    np_ = ctypes.c_int64()
    no = ctypes.c_int64()
    if _lib.bal_read_header(path.encode(), ctypes.byref(nc),
                            ctypes.byref(np_), ctypes.byref(no)) != 0:
        raise IOError(f"native BAL header parse failed: {path}")
    ncams, npnts, nobs = nc.value, np_.value, no.value
    cam_idx = np.empty(nobs, np.int64)
    pnt_idx = np.empty(nobs, np.int64)
    pt2d = np.empty((nobs, 2), np.float64)
    cams = np.empty((ncams, 9), np.float64)
    points = np.empty((npnts, 3), np.float64)
    if _lib.bal_parse(path.encode(), cam_idx, pnt_idx,
                      pt2d.reshape(-1), cams.reshape(-1),
                      points.reshape(-1)) != 0:
        raise IOError(f"native BAL parse failed: {path}")
    return cam_idx, pnt_idx, pt2d, cams, points
