"""Observability utilities + example scripts smoke tests."""

import os
import sys
import subprocess

import numpy as np

from sift3d_tpu.io import im_write
from sift3d_tpu.io.volume import Volume
from sift3d_tpu.utils import StageTimer, stage_report, set_log_fn

from tests.conftest import make_blob_volume

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stage_timer_and_report():
    records = []
    set_log_fn(records.append)
    try:
        import jax.numpy as jnp
        t = StageTimer("t")
        with t.stage("a") as out:
            out["x"] = jnp.ones(8) * 2
        rep = t.report()
        assert rep["stages"]["a"] > 0
        assert any(r["kind"] == "stage" for r in records)

        class FakeReg:
            A = np.hstack([np.eye(3), np.ones((3, 1))])
            num_matches = 12
            num_inliers = 9
            ok = True
        rec = stage_report(registration=FakeReg())
        assert rec["num_inliers"] == 9
        assert abs(rec["translation_norm"] - np.sqrt(3)) < 1e-6
    finally:
        set_log_fn(None)


def _run_example(script, args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=_REPO)
    return subprocess.run([sys.executable, os.path.join(_REPO, script)]
                          + args, capture_output=True, text=True, env=env,
                          cwd=_REPO, timeout=500)


def test_example_io(tmp_path):
    vol = make_blob_volume((8, 8, 8), seed=2)
    inp = str(tmp_path / "in.nii")
    im_write(inp, Volume(np.abs(vol)))
    out = str(tmp_path / "out.dcm")
    r = _run_example("examples/io.py", [inp, out])
    assert r.returncode == 0, r.stderr
    assert "dims (x, y, z): (8, 8, 8)" in r.stdout
    assert os.path.exists(out)
