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


def test_roofline_report():
    """Roofline accounting: costs scale with the plan and the report
    computes achieved-vs-peak percentages."""
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.utils import roofline

    plan = pyr_mod.plan_pyramid((64, 64, 64), (1.0, 1.0, 1.0),
                                SIFT3DParams())
    c = roofline.pyramid_cost(plan)
    assert c.bytes_moved > 64 ** 3 * 4 * 6      # > 6 full-res level passes
    assert c.flops > 0
    big = roofline.pyramid_cost(
        pyr_mod.plan_pyramid((128, 128, 128), (1.0, 1.0, 1.0),
                             SIFT3DParams()))
    assert big.bytes_moved > 6 * c.bytes_moved  # ~8x voxels

    recs = roofline.roofline_report(
        {"pyramid": 0.01}, {"pyramid": c})
    assert len(recs) == 1
    r = recs[0]
    assert r["achieved_GBps"] == round(c.bytes_moved / 0.01 / 1e9, 2)
    assert 0 <= r["hbm_pct_peak"]
    # match cost: flops dominated by the 2*n1*n2*768 Gram term
    m = roofline.match_cost(100, 200)
    assert m.flops == 2 * 100 * 200 * 768
