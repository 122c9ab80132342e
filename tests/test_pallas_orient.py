"""Pallas orientation window kernel vs the XLA gather path (interpret).

The kernel runs for real on TPU (assign_orientations_level selects it
automatically there); these tests pin numerical equivalence to the XLA
formulation on the generic interpreter, including anisotropic units,
window clamping at level edges, count-skip, and the custom_vmap rule.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sift3d_tpu.config import ORI_RAD_FCTR, ORI_SIG_FCTR
from sift3d_tpu.features.orientation import (assign_orientations_level,
                                             window_radii)
from sift3d_tpu.features.windows import window_extent
from sift3d_tpu.ops.pallas_orient import orient_terms_pallas


def _level(rng, shape):
    nz, ny, nx = shape
    z, y, x = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                          indexing="ij")
    vol = np.zeros(shape)
    for _ in range(30):
        c = rng.uniform(0, nz, 3)
        s = rng.uniform(1.5, 4.0)
        vol += rng.uniform(-1, 1) * np.exp(
            -((z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
            / (2 * s * s))
    return vol.astype(np.float32)


def _geometry(sd, units, shape):
    nz, ny, nx = shape
    sigma = ORI_SIG_FCTR * sd
    rad = sigma * ORI_RAD_FCTR
    Rx, Ry, Rz = window_radii(rad, units)
    cores = (window_extent(Rz, nz, True), window_extent(Ry, ny, True),
             window_extent(Rx, nx, True))
    return sigma, rad, (Rz, Ry, Rx), cores


def test_orient_kernel_matches_xla(rng):
    shape = (24, 28, 20)
    units = (1.0, 1.3, 0.8)
    level = _level(rng, shape)
    K = 7
    # Include near-edge keypoints so the clamped-window path is hit.
    zyx = np.stack([rng.integers(1, shape[0] - 1, K),
                    rng.integers(1, shape[1] - 1, K),
                    rng.integers(1, shape[2] - 1, K)], -1).astype(np.int32)
    zyx[0] = (1, 1, 1)
    zyx[1] = (shape[0] - 2, shape[1] - 2, shape[2] - 2)
    sd = 1.6

    R_x, valid_x, conf_x = assign_orientations_level(
        jnp.asarray(level), jnp.asarray(zyx), sd, units, 0.4,
        return_conf=True, use_pallas=False)
    R_p, valid_p, conf_p = assign_orientations_level(
        jnp.asarray(level), jnp.asarray(zyx), sd, units, 0.4,
        return_conf=True, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_x))
    vm = np.asarray(valid_x)
    np.testing.assert_allclose(np.asarray(R_p)[vm], np.asarray(R_x)[vm],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf_p)[vm],
                               np.asarray(conf_x)[vm], atol=1e-4)


def test_orient_terms_count_skip(rng):
    shape = (20, 20, 20)
    units = (1.0, 1.0, 1.0)
    level = _level(rng, shape)
    K = 4
    zyx = rng.integers(3, 16, (K, 3)).astype(np.int32)
    sd = 1.6
    sigma, rad, radii, cores = _geometry(sd, units, shape)
    A_all, vd_all = orient_terms_pallas(
        jnp.asarray(level), jnp.asarray(zyx), jnp.int32(K), radii, cores,
        units, float(sigma), float(rad), interpret=True)
    A_2, vd_2 = orient_terms_pallas(
        jnp.asarray(level), jnp.asarray(zyx), jnp.int32(2), radii, cores,
        units, float(sigma), float(rad), interpret=True)
    np.testing.assert_allclose(np.asarray(A_2)[:2], np.asarray(A_all)[:2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(vd_2)[:2], np.asarray(vd_all)[:2],
                               atol=1e-6)
    assert np.all(np.asarray(A_2)[2:] == 0)
    assert np.all(np.asarray(vd_2)[2:] == 0)


def test_orient_terms_vmap(rng):
    B, n, K = 3, 16, 4
    levels = rng.standard_normal((B, n, n, n)).astype(np.float32)
    zyx = rng.integers(3, n - 3, (B, K, 3)).astype(np.int32)
    sd = 1.6
    units = (1.0, 1.0, 1.0)
    sigma, rad, radii, cores = _geometry(sd, units, (n, n, n))
    counts = jnp.asarray([4, 2, 3], jnp.int32)

    def f(lv, z, cnt):
        return orient_terms_pallas(lv, z, cnt, radii, cores, units,
                                   float(sigma), float(rad),
                                   interpret=True)
    A_b, vd_b = jax.vmap(f)(jnp.asarray(levels), jnp.asarray(zyx), counts)
    for b in range(B):
        A_0, vd_0 = f(jnp.asarray(levels[b]), jnp.asarray(zyx[b]),
                      counts[b])
        np.testing.assert_allclose(np.asarray(A_b)[b], np.asarray(A_0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(vd_b)[b], np.asarray(vd_0),
                                   atol=1e-6)
