"""Sharded-vs-single-chip equivalence tests on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift3d_tpu.ops import conv
from sift3d_tpu.ops.gauss import gauss_taps
from sift3d_tpu.parallel import make_mesh, conv_sep_sharded, factor_devices

from tests.conftest import make_blob_volume


def test_factor_devices():
    assert factor_devices(8) == (2, 4)
    assert factor_devices(4) == (1, 4)
    assert factor_devices(6) == (3, 2)
    assert factor_devices(1) == (1, 1)


@pytest.mark.parametrize("units", [(1.0, 1.0, 1.0), (1.0, 1.5, 2.0)])
def test_conv_sep_sharded_matches_local(units):
    vol = jnp.asarray(make_blob_volume((32, 24, 20), seed=21))
    taps = gauss_taps(1.6)
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    want = np.asarray(conv.conv_sep(vol, taps, 1.0, units))
    got = np.asarray(conv_sep_sharded(vol, taps, 1.0, units, mesh))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_conv_sep_sharded_batched():
    vols = jnp.asarray(np.stack([make_blob_volume((16, 16, 16), seed=s)
                                 for s in range(4)]))
    taps = gauss_taps(1.15)
    mesh = make_mesh(jax.devices()[:8], data=4, space=2)
    want = np.stack([np.asarray(conv.conv_sep(v, taps, 1.0, (1., 1., 1.)))
                     for v in vols])
    got = np.asarray(conv_sep_sharded(vols, taps, 1.0, (1., 1., 1.), mesh))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_conv_sep_sharded_single_shard():
    vol = jnp.asarray(make_blob_volume((16, 16, 16), seed=22))
    taps = gauss_taps(2.0)
    mesh = make_mesh(jax.devices()[:2], data=2, space=1)
    want = np.asarray(conv.conv_sep(vol, taps, 1.0, (1., 1., 1.)))
    got = np.asarray(conv_sep_sharded(vol, taps, 1.0, (1., 1., 1.), mesh))
    np.testing.assert_allclose(got, want, atol=2e-6)
