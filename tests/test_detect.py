"""Golden tests: keypoint detection vs the reference C oracle."""

import numpy as np

from tests.conftest import make_blob_volume

from sift3d_tpu.config import SIFT3DParams
from sift3d_tpu.features.detect import detect_keypoints


def _compare_keypoints(got: np.ndarray, ref: np.ndarray, tol=0.01):
    assert got.shape[0] == ref.shape[0], (got.shape, ref.shape)
    # Same emission order expected: compare row by row.
    # Columns: x y z o sd R(9)
    np.testing.assert_allclose(got[:, :4], ref[:, :4], atol=1e-9)
    np.testing.assert_allclose(got[:, 4], ref[:, 4], atol=1e-6)
    np.testing.assert_allclose(got[:, 5:], ref[:, 5:], atol=tol)


def test_detect_matches_oracle(oracle):
    vol = make_blob_volume((32, 32, 32))
    ref = oracle.detect(vol)
    kp, _, _ = detect_keypoints(vol, (1.0, 1.0, 1.0), SIFT3DParams(max_kp_per_level=1024))
    got = kp.to_numpy()
    assert ref.shape[0] > 5, "oracle found too few keypoints to be a real test"
    _compare_keypoints(got, ref)


def test_detect_larger_volume(oracle):
    vol = make_blob_volume((48, 40, 56), seed=3)
    ref = oracle.detect(vol)
    kp, _, _ = detect_keypoints(vol, (1.0, 1.0, 1.0), SIFT3DParams(max_kp_per_level=1024))
    _compare_keypoints(kp.to_numpy(), ref)


def test_detect_anisotropic(oracle):
    vol = make_blob_volume((24, 32, 40), seed=5)
    units = (1.0, 1.25, 2.0)
    ref = oracle.detect(vol, units=units)
    kp, _, _ = detect_keypoints(vol, units, SIFT3DParams(max_kp_per_level=1024))
    _compare_keypoints(kp.to_numpy(), ref)


def test_detect_orthonormal_R():
    # Property test from the reference suite (Sift3DTest.m:245-274).
    vol = make_blob_volume((32, 32, 32))
    kp, _, _ = detect_keypoints(vol, (1.0, 1.0, 1.0), SIFT3DParams(max_kp_per_level=1024))
    arr = kp.to_numpy()
    n = arr.shape[0]
    R = arr[:, 5:].reshape(n, 3, 3)
    eye = np.eye(3)[None]
    assert np.abs(R @ np.transpose(R, (0, 2, 1)) - eye).max() < 1e-3
    det = np.linalg.det(R)
    np.testing.assert_allclose(det, 1.0, atol=1e-3)
    # Keypoints in bounds at base octave
    factor = 2.0 ** arr[:, 3]
    assert (arr[:, 0] * factor < 32).all() and (arr[:, 0] >= 0).all()


def test_per_octave_caps():
    """max_kp_per_octave bounds each octave's bucket (last entry extends
    to deeper octaves) and, when ample, changes nothing vs a flat cap."""
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.features.detect import level_cap

    params = SIFT3DParams(max_kp_per_level=512,
                          max_kp_per_octave=(128, 64, 16))
    plan = pyr_mod.plan_pyramid((64, 64, 64), (1., 1., 1.), params)
    assert level_cap(plan, 0, params) == 128
    assert level_cap(plan, 1, params) == 64
    assert level_cap(plan, 2, params) == 16
    assert level_cap(plan, 3, params) == 16       # last entry extends
    # Still clamped by the interior voxel count and the flat cap.
    small = SIFT3DParams(max_kp_per_level=4, max_kp_per_octave=(128,))
    assert level_cap(plan, 0, small) == 4

    vol = make_blob_volume((32, 32, 32), seed=3)
    flat = SIFT3DParams(max_kp_per_level=512)
    per_o = SIFT3DParams(max_kp_per_level=512,
                         max_kp_per_octave=(256, 128, 64))
    kp_flat = detect_keypoints(vol, (1., 1., 1.), flat)[0]
    kp_po = detect_keypoints(vol, (1., 1., 1.), per_o)[0]
    n1, n2 = int(kp_flat.count), int(kp_po.count)
    assert n1 == n2 and n1 > 0
    for f in ("x", "y", "z", "o", "s"):
        np.testing.assert_array_equal(
            np.asarray(getattr(kp_flat, f))[:n1],
            np.asarray(getattr(kp_po, f))[:n1])
