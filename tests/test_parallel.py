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


def test_sharded_extrema_matches_local(rng):
    """z-sharded extrema (halo + pmax + scan-order merge) == local."""
    import jax.numpy as jnp
    from sift3d_tpu.features.extrema import level_extrema
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.shard_extrema import level_extrema_sharded
    from tests.conftest import make_blob_volume

    B, cap = 2, 64
    prev = np.stack([make_blob_volume((16, 12, 20), seed=s)
                     for s in (1, 2)])
    cur = np.stack([make_blob_volume((16, 12, 20), seed=s)
                    for s in (3, 4)])
    nxt = np.stack([make_blob_volume((16, 12, 20), seed=s)
                    for s in (5, 6)])
    want_zyx, want_cnt = [], []
    for b in range(B):
        z, c, _ = level_extrema(jnp.asarray(prev[b]), jnp.asarray(cur[b]),
                                jnp.asarray(nxt[b]), 0.1, cap)
        want_zyx.append(np.asarray(z))
        want_cnt.append(int(c))
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    got_zyx, got_cnt, _ = level_extrema_sharded(
        jnp.asarray(prev), jnp.asarray(cur), jnp.asarray(nxt), 0.1, cap,
        mesh)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    np.testing.assert_array_equal(np.asarray(got_zyx), np.stack(want_zyx))


def test_batch_detect_describe_matches_single(rng):
    """The sharded batch pipeline (incl. z-sharded extrema) equals the
    single-volume path."""
    import jax.numpy as jnp
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.features.descriptor import extract_descriptors
    from sift3d_tpu.features.detect import detect_keypoints
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.pipeline import batch_detect_describe
    from tests.conftest import make_blob_volume

    params = SIFT3DParams(max_kp_per_level=128)
    vols = np.stack([make_blob_volume((16, 16, 16), seed=s)
                     for s in (7, 8)])
    plan = pyr_mod.plan_pyramid((16, 16, 16), (1., 1., 1.), params)
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    kp_b, desc_b, ov_b = batch_detect_describe(jnp.asarray(vols), plan,
                                               params, mesh)
    assert not np.asarray(ov_b).any()
    for b in range(2):
        kp, gpyr, _ = detect_keypoints(jnp.asarray(vols[b]),
                                       (1., 1., 1.), params)
        desc = extract_descriptors(gpyr, kp, plan, params)
        nb = int(np.asarray(kp_b.count)[b])
        assert nb == int(kp.count)
        np.testing.assert_allclose(
            np.asarray(desc_b.vec)[b][:nb], np.asarray(desc.vec)[:nb],
            atol=1e-5)


def test_conv_sep_sharded_y_and_x_axes(rng):
    """Any spatial axis can carry the shard (x/y variants equal the
    local kernel up to f32 pass-reordering)."""
    from sift3d_tpu.ops.gauss import gauss_taps

    vol = jnp.asarray(make_blob_volume((12, 24, 32), seed=33))
    taps = gauss_taps(1.2)
    units = (1.0, 1.3, 0.8)
    want = np.asarray(conv.conv_sep(vol, taps, 1.0, units))
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    got_y = np.asarray(conv_sep_sharded(vol, taps, 1.0, units, mesh,
                                        shard_dim="y"))
    got_x = np.asarray(conv_sep_sharded(vol, taps, 1.0, units, mesh,
                                        shard_dim="x"))
    np.testing.assert_allclose(got_y, want, atol=2e-5)
    np.testing.assert_allclose(got_x, want, atol=2e-5)


def test_sharded_extrema_y_and_x_axes(rng):
    """Axis-general extrema (VERDICT r3 #5): the scan-order merge is on
    global keys, so any sliced axis reproduces the local detector."""
    import jax.numpy as jnp
    from sift3d_tpu.features.extrema import level_extrema
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.shard_extrema import level_extrema_sharded
    from tests.conftest import make_blob_volume

    B, cap = 2, 64
    for shard_dim, shape in (("y", (6, 16, 20)), ("x", (6, 20, 16))):
        prev = np.stack([make_blob_volume(shape, seed=s) for s in (1, 2)])
        cur = np.stack([make_blob_volume(shape, seed=s) for s in (3, 4)])
        nxt = np.stack([make_blob_volume(shape, seed=s) for s in (5, 6)])
        want_zyx, want_cnt = [], []
        for b in range(B):
            z, c, _ = level_extrema(
                jnp.asarray(prev[b]), jnp.asarray(cur[b]),
                jnp.asarray(nxt[b]), 0.1, cap)
            want_zyx.append(np.asarray(z))
            want_cnt.append(int(c))
        mesh = make_mesh(jax.devices()[:8], data=2, space=4)
        got_zyx, got_cnt, _ = level_extrema_sharded(
            jnp.asarray(prev), jnp.asarray(cur), jnp.asarray(nxt), 0.1,
            cap, mesh, shard_dim=shard_dim)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(got_zyx),
                                      np.stack(want_zyx))


def test_batch_detect_describe_y_sharded_thin_z(rng):
    """The full sharded pipeline on a y-sharded mesh with a thin-z
    volume (the y-z-plane mammogram geometry, reference
    dicom.cpp:494-515, cannot shard its 8-deep z axis 4 ways usefully)."""
    import jax.numpy as jnp
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.features.descriptor import extract_descriptors
    from sift3d_tpu.features.detect import detect_keypoints
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.pipeline import batch_detect_describe
    from tests.conftest import make_blob_volume

    params = SIFT3DParams(max_kp_per_level=128)
    shape = (8, 24, 24)                    # (nz, ny, nx), thin z
    units = (1.0, 1.0, 2.0)                # thick slices
    vols = np.stack([make_blob_volume(shape, seed=s) for s in (7, 8)])
    plan = pyr_mod.plan_pyramid(shape[::-1], units, params)
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    kp_b, desc_b, ov_b = batch_detect_describe(
        jnp.asarray(vols), plan, params, mesh, shard_dim="y")
    assert not np.asarray(ov_b).any()
    for b in range(2):
        kp, gpyr, _ = detect_keypoints(jnp.asarray(vols[b]), units, params)
        desc = extract_descriptors(gpyr, kp, plan, params)
        nb = int(np.asarray(kp_b.count)[b])
        assert nb == int(kp.count)
        np.testing.assert_allclose(
            np.asarray(desc_b.vec)[b][:nb], np.asarray(desc.vec)[:nb],
            atol=1e-5)


def test_batch_detect_overflow_flag(rng):
    """A dense volume must trip the per-volume kp_overflow flag instead of
    silently losing keypoints (VERDICT r4 weak #4; the reference's
    keypoint store is unbounded, immacros.h:199-222), and the flag must
    propagate into batch_register_pairs' RegistrationResult."""
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import RansacParams, SIFT3DParams
    from sift3d_tpu.parallel.pipeline import (batch_detect_describe,
                                              batch_register_pairs)
    from tests.conftest import make_blob_volume

    # Tiny per-level cap + a busy blob volume => guaranteed truncation
    # on the dense pair, none on the near-empty pair.
    params = SIFT3DParams(max_kp_per_level=1)
    dense_vol = make_blob_volume((16, 16, 16), seed=7)
    empty_vol = np.zeros((16, 16, 16), np.float32)
    empty_vol[6:10, 6:10, 6:10] = 1.0      # a single blob: <=1 kp/level
    vols = np.stack([dense_vol, empty_vol])
    plan = pyr_mod.plan_pyramid((16, 16, 16), (1., 1., 1.), params)
    mesh = make_mesh(jax.devices()[:2], data=2, space=1)

    _, _, ov = batch_detect_describe(jnp.asarray(vols), plan, params, mesh)
    ov = np.asarray(ov)
    assert ov.shape == (2,)
    assert ov[0], "dense volume must report keypoint truncation"

    res = batch_register_pairs(jnp.asarray(vols), jnp.asarray(vols), plan,
                               params, mesh,
                               ransac_params=RansacParams(num_iter=20))
    rov = np.asarray(res.kp_overflow)
    assert rov.shape == (2,) and rov[0]

    # Sanity leg: at an ample cap the same volumes report no overflow.
    params_ok = SIFT3DParams(max_kp_per_level=512)
    plan_ok = pyr_mod.plan_pyramid((16, 16, 16), (1., 1., 1.), params_ok)
    _, _, ov_ok = batch_detect_describe(jnp.asarray(vols), plan_ok,
                                        params_ok, mesh)
    assert not np.asarray(ov_ok).any()
