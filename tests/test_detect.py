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
