"""Raw-descriptor path + resampled registration ground truth.

Analogs of the reference's rawDescriptorTest (Sift3DTest.m:179-201) and
regAnisoTest (Sift3DTest.m:332-358).
"""

import numpy as np
import jax.numpy as jnp

from sift3d_tpu.api import Sift3D, RegSift3D
from sift3d_tpu.config import SIFT3DParams

from tests.conftest import make_blob_volume


def _kp_rows15(kp):
    """(N, 15) [x y z o s sd R00..R22] for the oracle."""
    n = int(kp.count)
    out = np.zeros((n, 15), np.float64)
    out[:, 0] = np.asarray(kp.x)[:n]
    out[:, 1] = np.asarray(kp.y)[:n]
    out[:, 2] = np.asarray(kp.z)[:n]
    out[:, 3] = np.asarray(kp.o)[:n]
    out[:, 4] = np.asarray(kp.s)[:n]
    out[:, 5] = np.asarray(kp.sd)[:n]
    out[:, 6:] = np.asarray(kp.R)[:n].reshape(n, 9)
    return out


def test_extract_raw_vs_oracle(oracle):
    vol = make_blob_volume((32, 32, 32), seed=9)
    sift = Sift3D(SIFT3DParams(max_kp_per_level=1024))
    kp = sift.detect(vol)
    n = int(kp.count)
    assert n > 3

    want = oracle.extract_raw(vol, _kp_rows15(kp))
    got = sift.extract_raw(vol, kp)
    gn = got.to_numpy()[:n]
    assert len(want) == n
    np.testing.assert_allclose(gn[:, :3], want[:, :3], atol=1e-3)
    np.testing.assert_allclose(gn[:, 3:], want[:, 4:], atol=2e-3)


def test_raw_vs_pyramid_agreement():
    """rawDescriptorTest: raw and pyramid descriptors agree within 0.2."""
    vol = make_blob_volume((32, 32, 32), seed=9)
    sift = Sift3D(SIFT3DParams(max_kp_per_level=1024))
    kp = sift.detect(vol)
    n = int(kp.count)
    d_pyr = sift.extract(kp).to_numpy()[:n]
    d_raw = sift.extract_raw(vol, kp).to_numpy()[:n]
    np.testing.assert_allclose(d_raw[:, :3], d_pyr[:, :3], atol=1e-6)
    assert np.max(np.abs(d_raw[:, 3:] - d_pyr[:, 3:])) < 0.2


def test_register_resample_aniso():
    """regAnisoTest: drop every other z slice, double the z unit, register
    with resample; the recovered transform must be diag(1,1,2) within the
    reference's 5e-2 / 5-voxel contract (Sift3DTest.m:349-357)."""
    vol = make_blob_volume((48, 48, 48), seed=4)
    aniso = vol[::2]                       # (24, 48, 48), z unit 2.0

    reg = RegSift3D(SIFT3DParams(max_kp_per_level=1024))
    res = reg.register(vol, aniso, src_units=(1.0, 1.0, 1.0),
                       ref_units=(1.0, 1.0, 2.0), resample=True)
    assert res.ok
    A = res.A
    want = np.diag([1.0, 1.0, 2.0])
    np.testing.assert_allclose(A[:, :3], want, atol=5e-2)
    np.testing.assert_allclose(A[:, 3], 0.0, atol=5.0)
