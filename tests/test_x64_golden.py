"""Permanent x64 golden leg.

The main suite deliberately runs with x64 disabled (every f64() in the
product degrades to f32 - see conftest.py). This test pins the float64
configuration in a subprocess with its own jax config, so CI can never
silently lose f64 parity again: detect + extract on a small volume must
match the C oracle (which accumulates in double where the reference
does, sift.c:1400-1417, 2925-2931).
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNIPPET = """
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
assert jax.numpy.zeros(1, jax.numpy.float64).dtype == np.float64

from tests import oracle as orc_mod
from tests.conftest import make_blob_volume
from sift3d_tpu.dtypes import f64
assert f64() == jax.numpy.float64

from sift3d_tpu.config import SIFT3DParams
from sift3d_tpu.features.detect import detect_keypoints
from sift3d_tpu.features.descriptor import extract_descriptors

orc = orc_mod.get()
if orc is None:
    print("SKIP_NO_ORACLE")
    sys.exit(0)

vol = make_blob_volume((20, 20, 20), seed=9)
ref_kp = orc.detect(vol)
ref_desc = orc.extract()

params = SIFT3DParams(max_kp_per_level=256)
kp, gpyr, plan = detect_keypoints(jax.numpy.asarray(vol), (1., 1., 1.),
                                  params)
got_kp = kp.to_numpy()
assert got_kp.shape[0] == ref_kp.shape[0], (got_kp.shape, ref_kp.shape)
np.testing.assert_allclose(got_kp[:, :5], ref_kp[:, :5], atol=1e-4)

desc = extract_descriptors(gpyr, kp, plan, params)
got = desc.to_numpy()
np.testing.assert_allclose(got[:, :3], ref_desc[:, :3], atol=1e-6)
err = np.abs(got[:, 3:] - ref_desc[:, 4:]).max()
assert err < 2e-3, err
print("X64_GOLDEN_OK", got_kp.shape[0], err)
""" % {"repo": _REPO}


def test_x64_golden_leg():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", _SNIPPET],
                       capture_output=True, text=True, cwd=_REPO,
                       timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "X64_GOLDEN_OK" in r.stdout or "SKIP_NO_ORACLE" in r.stdout
