"""Z-sharded windowed stages (partial-sum + psum) vs the unsharded path.

Covers SURVEY §5.7's back half: orientation and descriptor windows
partitioned over z (parallel/shard_windows.py), checked for equality
against features/orientation and features/descriptor on the 8-device
virtual CPU mesh. Tolerances are f32-reassociation bounds: the sharded
path sums each window in per-shard partials joined by psum.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sift3d_tpu.features.descriptor import extract_level
from sift3d_tpu.features.orientation import assign_orientations_level
from sift3d_tpu.parallel import make_mesh
from sift3d_tpu.parallel.shard_windows import (descrip_level_z_sharded,
                                               orient_level_z_sharded)

from tests.conftest import make_blob_volume


def _levels_and_kp(rng, B=2, shape=(16, 18, 14), K=6):
    levels = np.stack([make_blob_volume(shape, seed=40 + b)
                       for b in range(B)])
    kp = np.stack([
        np.stack([rng.integers(2, shape[0] - 3, K),
                  rng.integers(2, shape[1] - 3, K),
                  rng.integers(2, shape[2] - 3, K)], -1)
        for _ in range(B)]).astype(np.int32)
    return levels, kp


def test_orient_z_sharded_equals_single(rng):
    levels, kp = _levels_and_kp(rng)
    sd, units, thresh = 1.6, (1.0, 1.3, 0.8), 0.4
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    R_s, val_s = orient_level_z_sharded(
        jnp.asarray(levels), jnp.asarray(kp), sd, units, thresh, mesh)
    for b in range(levels.shape[0]):
        R1, val1 = assign_orientations_level(
            jnp.asarray(levels[b]), jnp.asarray(kp[b]), sd, units, thresh)
        np.testing.assert_array_equal(np.asarray(val_s)[b],
                                      np.asarray(val1))
        ok = np.asarray(val1)
        np.testing.assert_allclose(np.asarray(R_s)[b][ok],
                                   np.asarray(R1)[ok], atol=2e-4)


def test_descrip_z_sharded_equals_single(rng):
    levels, kp = _levels_and_kp(rng)
    B, K = kp.shape[:2]
    sd, units = 1.6, (1.0, 1.3, 0.8)   # anisotropic
    centers = kp.astype(np.float32) + rng.uniform(-0.4, 0.4, kp.shape
                                                  ).astype(np.float32)
    Q = np.stack([[np.linalg.qr(rng.standard_normal((3, 3)))[0]
                   for _ in range(K)] for _ in range(B)]
                 ).astype(np.float32)
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    got = np.asarray(descrip_level_z_sharded(
        jnp.asarray(levels), jnp.asarray(centers), jnp.asarray(Q),
        sd, units, mesh))
    for b in range(B):
        want = np.asarray(extract_level(
            jnp.asarray(levels[b]), jnp.asarray(centers[b]),
            jnp.asarray(Q[b]), sd, units, use_pallas=False))
        np.testing.assert_allclose(got[b], want, atol=2e-4)


def test_orient_z_sharded_space_only_mesh(rng):
    """Works with a degenerate data axis (1 volume, all chips on z)."""
    levels, kp = _levels_and_kp(rng, B=1, shape=(24, 12, 12), K=4)
    sd, units, thresh = 1.6, (1.0, 1.0, 1.0), 0.4
    mesh = make_mesh(jax.devices()[:8], data=1, space=8)
    R_s, val_s = orient_level_z_sharded(
        jnp.asarray(levels), jnp.asarray(kp), sd, units, thresh, mesh)
    R1, val1 = assign_orientations_level(
        jnp.asarray(levels[0]), jnp.asarray(kp[0]), sd, units, thresh)
    np.testing.assert_array_equal(np.asarray(val_s)[0], np.asarray(val1))
    ok = np.asarray(val1)
    np.testing.assert_allclose(np.asarray(R_s)[0][ok],
                               np.asarray(R1)[ok], atol=2e-4)


def test_orient_sharded_y_and_x_axes(rng):
    """Axis-general windows (VERDICT r3 #5): y/x-sharded orientation
    equals the unsharded path with anisotropic units, incl. a thin-z
    geometry that cannot shard over z at all."""
    import pytest
    from sift3d_tpu.parallel.shard_windows import orient_level_sharded

    sd, units, thresh = 1.6, (1.0, 1.3, 0.8), 0.4
    for shard_dim, shape in (("y", (6, 16, 14)), ("x", (6, 14, 16))):
        levels, kp = _levels_and_kp(rng, shape=shape)
        mesh = make_mesh(jax.devices()[:8], data=2, space=4)
        R_s, val_s = orient_level_sharded(
            jnp.asarray(levels), jnp.asarray(kp), sd, units, thresh,
            mesh, shard_dim=shard_dim)
        for b in range(levels.shape[0]):
            R1, val1 = assign_orientations_level(
                jnp.asarray(levels[b]), jnp.asarray(kp[b]), sd, units,
                thresh)
            np.testing.assert_array_equal(np.asarray(val_s)[b],
                                          np.asarray(val1))
            ok = np.asarray(val1)
            np.testing.assert_allclose(np.asarray(R_s)[b][ok],
                                       np.asarray(R1)[ok], atol=2e-4)


def test_descrip_sharded_y_and_x_axes(rng):
    from sift3d_tpu.parallel.shard_windows import descrip_level_sharded

    sd, units = 1.6, (1.0, 1.3, 0.8)
    for shard_dim, shape in (("y", (6, 16, 14)), ("x", (6, 14, 16))):
        levels, kp = _levels_and_kp(rng, shape=shape)
        B, K = kp.shape[:2]
        centers = kp.astype(np.float32) + rng.uniform(
            -0.4, 0.4, kp.shape).astype(np.float32)
        Q = np.stack([[np.linalg.qr(rng.standard_normal((3, 3)))[0]
                       for _ in range(K)] for _ in range(B)]
                     ).astype(np.float32)
        mesh = make_mesh(jax.devices()[:8], data=2, space=4)
        got = np.asarray(descrip_level_sharded(
            jnp.asarray(levels), jnp.asarray(centers), jnp.asarray(Q),
            sd, units, mesh, shard_dim=shard_dim))
        for b in range(B):
            want = np.asarray(extract_level(
                jnp.asarray(levels[b]), jnp.asarray(centers[b]),
                jnp.asarray(Q[b]), sd, units, use_pallas=False))
            np.testing.assert_allclose(got[b], want, atol=2e-4)
