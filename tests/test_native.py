"""Native C++ BAL parser vs the pure-Python reader."""

import numpy as np
import pytest

from bundleadjustment_jl_tpu.io.bal import _read_raw, load_fixture, write_bal

native = pytest.importorskip("bundleadjustment_jl_tpu.io.native")


@pytest.fixture(scope="module", params=["plain", "bz2"])
def bal_file(request, tmp_path_factory):
    if request.param == "bz2" and not native.NATIVE_BZ2:
        pytest.skip("libbz2 not available to the native parser")
    ext = ".txt" if request.param == "plain" else ".txt.bz2"
    path = str(tmp_path_factory.mktemp("bal") / f"fixture{ext}")
    write_bal(path, load_fixture())
    return path


def test_native_matches_python_reader(bal_file):
    got = native.parse_bal_native(bal_file)
    want = _read_raw(bal_file)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, dtype=np.float64),
                                   np.asarray(w, dtype=np.float64),
                                   rtol=0, atol=0)


def test_native_header(bal_file):
    import ctypes
    nc, np_, no = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
    rc = native._lib.bal_read_header(bal_file.encode(), ctypes.byref(nc),
                                     ctypes.byref(np_), ctypes.byref(no))
    assert rc == 0
    assert (nc.value, np_.value, no.value) == (5, 1, 5)


def test_native_missing_file_raises():
    with pytest.raises(IOError):
        native.parse_bal_native("/nonexistent/file.txt")
