"""Raw orientation API + keypoint validation (Matlab-surface analogs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sift3d_tpu.api import Sift3D, assign_orientations, validate_keypoints
from sift3d_tpu.config import SIFT3DParams

from tests.conftest import make_blob_volume


def _angles_between(R1, R2):
    """Rotation angle between corresponding matrices."""
    tr = np.einsum("kij,kij->k", R1, R2)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.arccos(cos)


def test_raw_orientation_agreement():
    """rawOrientationTest analog (Sift3DTest.m:205-242): pyramid vs raw
    orientations agree within median angle < pi/8."""
    vol = make_blob_volume((32, 32, 32), seed=9)
    sift = Sift3D(SIFT3DParams(max_kp_per_level=1024))
    kp = sift.detect(vol)
    n = int(kp.count)
    assert n > 3
    R_raw, conf = assign_orientations(vol, kp)
    accepted = conf[:n] >= 0
    assert accepted.mean() > 0.5
    ang = _angles_between(np.asarray(kp.R)[:n][accepted],
                          R_raw[:n][accepted])
    assert np.median(ang) < np.pi / 8


def test_validate_keypoints_passes_on_detection():
    vol = make_blob_volume((32, 32, 32), seed=9)
    sift = Sift3D(SIFT3DParams(max_kp_per_level=1024))
    kp = sift.detect(vol)
    validate_keypoints(kp, dims_xyz=(32, 32, 32))


def test_validate_keypoints_rejects_bad_rotation():
    vol = make_blob_volume((32, 32, 32), seed=9)
    sift = Sift3D(SIFT3DParams(max_kp_per_level=1024))
    kp = sift.detect(vol)
    # Reflection (det -1) must be rejected (keypoint3D.m:84-103).
    R = np.asarray(kp.R).copy()
    R[0] = np.diag([1.0, 1.0, -1.0])
    kp.R = jnp.asarray(R)
    with pytest.raises(ValueError):
        validate_keypoints(kp)
    # Non-orthogonal must be rejected.
    R[0] = np.eye(3) * 2.0
    kp.R = jnp.asarray(R)
    with pytest.raises(ValueError):
        validate_keypoints(kp)


def test_detect_and_extract_matches_two_stage():
    """The fused path must produce the same descriptors as detect+extract.

    Tolerance is float32 rounding, not bit-exactness: the fused and
    two-stage programs run the window kernel at different static bucket
    capacities (fused_bucket_cap vs pow2-of-count), so the compiler may
    tile the histogram reductions differently (~5e-8 drift observed; the
    golden contract vs the C reference is 2e-3)."""
    vol = make_blob_volume((32, 32, 32), seed=9)
    sift = Sift3D(SIFT3DParams(max_kp_per_level=1024))
    kp1 = sift.detect(vol)
    d1 = sift.extract(kp1)
    kp2, d2 = sift.detect_and_extract(vol)
    n = int(kp1.count)
    assert int(kp2.count) == n
    r1, r2 = d1.to_numpy()[:n], d2.to_numpy()[:n]
    np.testing.assert_allclose(r2, r1, rtol=0, atol=1e-6)
