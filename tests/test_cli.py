"""CLI driver tests (the reference's `solve_ba.jl` role)."""

import json
import os
import subprocess
import sys

import pytest

from bundleadjustment_jl_tpu.cli import main
from bundleadjustment_jl_tpu.io.bal import load_fixture, read_bal, write_bal


def test_cli_synthetic_json(capsys):
    rc = main(["synthetic:ncams=5,npnts=40,obs_per_pnt=3,seed=3",
               "--driver", "jit", "--max-iters", "40", "--json"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert rc == 0
    assert stats["status"] in ("first_order", "small_step",
                               "small_residual", "small_obj_change")
    assert stats["iterations"] <= 40


def test_cli_host_driver(capsys):
    rc = main(["synthetic:ncams=5,npnts=40,obs_per_pnt=4,seed=3",
               "--driver", "host", "--solver", "dense",
               "--max-iters", "60", "--json"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 1)  # plumbing test; solver behavior covered in test_lm
    assert stats["driver"] == "host"
    assert stats["iterations"] <= 60


def test_cli_reads_and_saves_bal(tmp_path, capsys):
    src = str(tmp_path / "fix.txt")
    out = str(tmp_path / "refined.txt.bz2")
    write_bal(src, load_fixture())
    rc = main([src, "--driver", "jit", "--max-iters", "10", "--json",
               "--save", out])
    capsys.readouterr()
    assert rc == 0
    refined = read_bal(out)
    assert refined.ncams == 5 and refined.npnts == 1 and refined.nobs == 5


def test_cli_mesh_flag(capsys):
    rc = main(["synthetic:ncams=5,npnts=40,obs_per_pnt=3,seed=3,pad_obs_to=128",
               "--mesh", "8", "--max-iters", "20", "--json"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 1)  # plumbing test; 20 iters may not converge
    assert stats["iterations"] <= 20
    assert stats["status"] != "exception"


def test_cli_spmd_driver(capsys):
    from bundleadjustment_jl_tpu.ops import pallas_schur
    assert not pallas_schur.PALLAS_MODE
    try:
        rc = main(["synthetic:ncams=5,npnts=80,obs_per_pnt=3,seed=3",
                   "--driver", "spmd", "--mesh", "4", "--max-iters", "20",
                   "--dtype", "f32", "--json"])
    finally:
        pallas_schur.set_mode(False)
        pallas_schur.INTERPRET = False
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc in (0, 1)
    assert stats["driver"] == "spmd"
    assert stats["status"] != "exception"


@pytest.mark.skipif(os.environ.get("BA_TPU_SUBPROC_TESTS") == "0",
                    reason="subprocess test disabled via env")
def test_cli_entrypoint_subprocess():
    proc = subprocess.run(
        [sys.executable, "-m", "bundleadjustment_jl_tpu",
         "synthetic:ncams=4,npnts=20,obs_per_pnt=2,seed=1",
         "--platform", "cpu", "--max-iters", "5", "--json"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode in (0, 1), proc.stderr
