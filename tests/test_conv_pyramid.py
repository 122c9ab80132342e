"""Golden tests: convolution and pyramid vs the reference C oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_blob_volume

import sift3d_tpu.pyramid as pyr
from sift3d_tpu.config import SIFT3DParams
from sift3d_tpu.ops import conv, gauss


def test_gauss_taps_match_widths():
    t = gauss.gauss_taps(1.6)
    assert len(t) == 2 * 5 + 1  # ceil(3*1.6)=5
    assert abs(float(t.sum()) - 1.0) < 1e-6
    t = gauss.gauss_taps(0.5)
    assert len(t) == 2 * 2 + 1


@pytest.mark.parametrize("units,unit", [
    ((1.0, 1.0, 1.0), 1.0),
    ((1.0, 1.0, 2.0), 1.0),
    ((0.7, 1.3, 1.0), 1.0),
    ((1.0, 1.0, 1.0), 0.5),
])
def test_gauss_blur_matches_oracle(oracle, units, unit):
    vol = make_blob_volume((24, 20, 16))
    sigma = 1.6
    ref = oracle.gauss_blur(vol, units=units, sigma=sigma, unit=unit)
    taps = gauss.gauss_taps(sigma)
    got = np.asarray(conv.conv_sep(vol, taps, unit, units))
    assert np.max(np.abs(got - ref)) < 2e-5, np.max(np.abs(got - ref))


def test_gpyr_matches_oracle(oracle):
    vol = make_blob_volume((32, 32, 32))
    kp = oracle.detect(vol)  # builds the oracle's pyramid as a side effect
    del kp
    params = SIFT3DParams()
    plan = pyr.plan_pyramid((32, 32, 32), (1.0, 1.0, 1.0), params)
    scaled = np.asarray(pyr.im_scale(vol))
    gpyr = pyr.build_gpyr(scaled, plan)
    assert plan.num_octaves == oracle.lib.orc_num_octaves()
    worst = 0.0
    for o in range(plan.num_octaves):
        for s in range(plan.first_level, plan.last_gpyr_level + 1):
            ref = oracle.gpyr_level(o, s)
            got = np.asarray(gpyr[(o, s)])
            assert got.shape == ref.shape, (o, s, got.shape, ref.shape)
            err = np.max(np.abs(got - ref))
            worst = max(worst, err)
            assert err < 5e-5, (o, s, err)
    # DoG
    dog = pyr.build_dog(gpyr, plan)
    for o in range(plan.num_octaves):
        for s in range(plan.first_level, plan.last_dog_level + 1):
            ref = oracle.dog_level(o, s)
            got = np.asarray(dog[(o, s)])
            err = np.max(np.abs(got - ref))
            assert err < 5e-5, (o, s, err)


def test_gpyr_anisotropic_matches_oracle(oracle):
    vol = make_blob_volume((16, 24, 32))
    units = (1.0, 1.5, 2.0)
    oracle.detect(vol, units=units)
    params = SIFT3DParams()
    plan = pyr.plan_pyramid((32, 24, 16), units, params)
    scaled = np.asarray(pyr.im_scale(vol))
    gpyr = pyr.build_gpyr(scaled, plan)
    for o in range(plan.num_octaves):
        for s in range(plan.first_level, plan.last_gpyr_level + 1):
            ref = oracle.gpyr_level(o, s)
            got = np.asarray(gpyr[(o, s)])
            assert got.shape == ref.shape
            err = np.max(np.abs(got - ref))
            assert err < 5e-5, (o, s, err)


def test_conv_axis_banded_matches_matmul(rng):
    """The diagonal (banded) formulation equals the matmul on the same
    exact matrix, including mirror boundaries and mm-unit interpolation."""
    from sift3d_tpu.ops.conv import (conv_axis, conv_axis_banded,
                                     conv_matrix)
    from sift3d_tpu.ops.gauss import gauss_taps

    taps = gauss_taps(2.2)
    vol = jnp.asarray(rng.standard_normal((12, 40, 24)).astype(np.float32))
    for axis, unit_dim in ((0, 1.0), (1, 0.7), (2, 1.9)):
        n = vol.shape[axis]
        want = np.asarray(conv_axis(vol, conv_matrix(taps, 1.0, unit_dim,
                                                     n), axis))
        got = np.asarray(conv_axis_banded(vol, taps, 1.0, unit_dim, axis))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_sep_banded_threshold(rng, monkeypatch):
    """conv_sep output is unchanged when the banded path is forced on."""
    from sift3d_tpu.ops import conv
    from sift3d_tpu.ops.gauss import gauss_taps

    taps = gauss_taps(1.6)
    vol = jnp.asarray(rng.standard_normal((16, 20, 18)).astype(np.float32))
    want = np.asarray(conv.conv_sep(vol, taps, 1.0, (1.0, 1.3, 0.8)))
    monkeypatch.setattr(conv, "BANDED_MIN_N", 1)
    got = np.asarray(conv.conv_sep(vol, taps, 1.0, (1.0, 1.3, 0.8)))
    np.testing.assert_allclose(got, want, atol=2e-5)
