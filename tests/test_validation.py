"""Parameter validation negative tests (Sift3DTest.m:392-437, 730-763)."""

import numpy as np
import pytest

from sift3d_tpu.config import MatchParams, RansacParams, SIFT3DParams
from sift3d_tpu.config import num_octaves_for_dims
from sift3d_tpu.io.volume import Volume


@pytest.mark.parametrize("kw", [
    {"peak_thresh": 0.0}, {"peak_thresh": -1.0}, {"peak_thresh": 1.5},
    {"corner_thresh": -0.1}, {"corner_thresh": 1.1},
    {"num_kp_levels": 0}, {"sigma_n": -1.0}, {"sigma0": -1.0},
])
def test_invalid_sift3d_params(kw):
    with pytest.raises(ValueError):
        SIFT3DParams(**kw).validate()


@pytest.mark.parametrize("kw", [
    {"err_thresh": -1.0}, {"num_iter": 0},
])
def test_invalid_ransac_params(kw):
    with pytest.raises(ValueError):
        RansacParams(**kw).validate()


@pytest.mark.parametrize("v", [0.0, -0.5, 1.5])
def test_invalid_nn_thresh(v):
    with pytest.raises(ValueError):
        MatchParams(nn_thresh=v).validate()


def test_volume_too_small():
    # Minimum 8 voxels per dimension (sift.c:952-961).
    with pytest.raises(ValueError):
        num_octaves_for_dims(4, 32, 32)
    assert num_octaves_for_dims(8, 8, 8) == 1
    assert num_octaves_for_dims(32, 32, 32) == 3


@pytest.mark.parametrize("units", [(0, 1, 1), (-1, 1, 1), (1, 1, -2)])
def test_invalid_units(units):
    with pytest.raises(ValueError):
        Volume(np.zeros((4, 4, 4), np.float32), units)


def test_volume_bad_rank():
    with pytest.raises(ValueError):
        Volume(np.zeros((4, 4), np.float32))
