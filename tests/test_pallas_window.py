"""Pallas descriptor window kernel vs the XLA gather path (interpret mode).

The kernel is exercised for real on TPU (where extract_level selects it
automatically); here the generic interpreter pins numerical equivalence
to the XLA formulation, including anisotropic units, fractional centers,
rotation matrices, count-skip, and the full-x widening (core-x = nx - 2).
"""

import math

import numpy as np
import jax.numpy as jnp

from sift3d_tpu.config import DESC_RAD_FCTR, DESC_SIG_FCTR
from sift3d_tpu.features.descriptor import extract_level, postprocess
from sift3d_tpu.features.windows import window_extent
from sift3d_tpu.ops.pallas_window import descrip_level_pallas


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


def _rotations(rng, k):
    A = rng.standard_normal((k, 3, 3))
    return np.array([np.linalg.qr(a)[0] for a in A]).astype(np.float32)


def _geometry(sd, units, shape):
    nz, ny, nx = shape
    sigma = np.float32(sd) * np.float32(DESC_SIG_FCTR)
    rad = np.float32(DESC_RAD_FCTR) * sigma
    Rx = int(math.ceil(float(rad) / units[0]))
    Ry = int(math.ceil(float(rad) / units[1]))
    Rz = int(math.ceil(float(rad) / units[2]))
    cores = (window_extent(Rz, nz, False), window_extent(Ry, ny, False),
             window_extent(Rx, nx, False))
    return sigma, rad, (Rz, Ry, Rx), cores


def test_window_kernel_matches_xla(rng):
    shape = (24, 28, 20)
    units = (1.0, 1.3, 0.8)
    level = _level(rng, shape)
    K = 5
    centers = np.stack([rng.uniform(3, shape[0] - 4, K),
                        rng.uniform(3, shape[1] - 4, K),
                        rng.uniform(3, shape[2] - 4, K)], -1
                       ).astype(np.float32)
    Q = _rotations(rng, K)
    sd = 1.6
    sigma, rad, radii, cores = _geometry(sd, units, shape)

    want = np.asarray(extract_level(jnp.asarray(level),
                                    jnp.asarray(centers), jnp.asarray(Q),
                                    sd, units, use_pallas=False))
    raw = descrip_level_pallas(jnp.asarray(level), jnp.asarray(centers),
                               jnp.asarray(Q), jnp.int32(K), radii, cores,
                               units, float(sigma), float(rad),
                               interpret=True)
    got = np.asarray(postprocess(raw))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_window_kernel_count_skip(rng):
    """Rows >= count are skipped; real rows are unaffected."""
    shape = (20, 20, 20)
    units = (1.0, 1.0, 1.0)
    level = _level(rng, shape)
    K = 4
    centers = np.stack([rng.uniform(3, 16, K)] * 3, -1).astype(np.float32)
    Q = _rotations(rng, K)
    sd = 1.6
    sigma, rad, radii, cores = _geometry(sd, units, shape)
    want = np.asarray(postprocess(descrip_level_pallas(
        jnp.asarray(level), jnp.asarray(centers), jnp.asarray(Q),
        jnp.int32(K), radii, cores, units, float(sigma), float(rad),
        interpret=True)))
    got2 = np.asarray(postprocess(descrip_level_pallas(
        jnp.asarray(level), jnp.asarray(centers), jnp.asarray(Q),
        jnp.int32(2), radii, cores, units, float(sigma), float(rad),
        interpret=True)))
    np.testing.assert_allclose(got2[:2], want[:2], atol=1e-6)


def test_window_kernel_vmap(rng):
    """The custom_vmap rule (batch flattened into the kernel grid) equals
    per-volume invocations."""
    import jax
    B, n, K = 3, 16, 4
    levels = rng.standard_normal((B, n, n, n)).astype(np.float32)
    centers = rng.uniform(3, n - 4, (B, K, 3)).astype(np.float32)
    Q = np.stack([_rotations(rng, K) for _ in range(B)])
    sd = 1.6
    units = (1.0, 1.0, 1.0)
    sigma, rad, radii, cores = _geometry(sd, units, (n, n, n))
    counts = jnp.asarray([4, 2, 3], jnp.int32)

    def f(lv, c, r, cnt):
        return descrip_level_pallas(lv, c, r, cnt, radii, cores, units,
                                    float(sigma), float(rad),
                                    interpret=True)
    out_b = jax.vmap(f)(jnp.asarray(levels), jnp.asarray(centers),
                        jnp.asarray(Q), counts)
    for b in range(B):
        out_0 = f(jnp.asarray(levels[b]), jnp.asarray(centers[b]),
                  jnp.asarray(Q[b]), counts[b])
        np.testing.assert_allclose(np.asarray(out_b)[b],
                                   np.asarray(out_0), atol=1e-6)
