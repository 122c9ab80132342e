"""Orientation assignment via the gradient structure tensor.

Reproduces assign_orientations / assign_eig_ori (reference
sift3d/sift.c:1259-1514):

- window = sphere of radius 3 * (1.5 * sd) in real-world units around the
  keypoint, clipped to [1, n-2] per dimension (IM_LOOP_SPHERE_START,
  sift.c:96-119);
- Gaussian-weighted 3x3 structure tensor (double accumulation) and window
  gradient (float accumulation) from unit-corrected central differences
  (IM_GET_GRAD_ISO, sift.c:150-155);
- reject if |window gradient|^2 < 1e-10 (sift.c:1426);
- eigendecompose ascending; reject if any adjacent eigenvalue ratio
  magnitude exceeds 0.90 (sift.c:1440-1444);
- two leading eigenvectors sign-fixed by positive directional derivative;
  third column = cross product; corner score = min |cos(angle to window
  gradient)|, rejected if < corner_thresh (sift.c:1446-1492, thresh wrapper
  sift.c:1331-1342).

TPU mapping: all keypoints of one pyramid level share the same scale, hence
the same fixed window box — so the sphere gather becomes a batched
dynamic-slice from a zero-padded level, and the reductions become masked
sums. Eigendecomposition runs batched over keypoints.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAX_EIG_RATIO, ORI_GRAD_THRESH, ORI_SIG_FCTR, ORI_RAD_FCTR
from ..dtypes import f64


def window_radii(rad: float, units: tuple[float, float, float],
                 ) -> tuple[int, int, int]:
    """Per-dimension voxel half-extents of the sphere's bounding box."""
    return tuple(int(math.ceil(np.float32(rad) / np.float32(u)))
                 for u in units)


def _window_terms(padded, zyx, radii, units, rad, sigma, dims):
    """Gather one keypoint's window and compute masked per-voxel terms.

    Returns (A(3,3) f64, vd_win(3,) f32, any potential voxel out of image).
    """
    Rx, Ry, Rz = radii
    nx, ny, nz = dims
    ux = np.float32(units[0]); uy = np.float32(units[1])
    uz = np.float32(units[2])
    z, y, x = zyx[0], zyx[1], zyx[2]
    win = jax.lax.dynamic_slice(
        padded, (z, y, x), (2 * Rz + 3, 2 * Ry + 3, 2 * Rx + 3))

    # Window voxel coordinates relative to the keypoint
    dz = jnp.arange(-Rz, Rz + 1, dtype=jnp.int32)[:, None, None]
    dy = jnp.arange(-Ry, Ry + 1, dtype=jnp.int32)[None, :, None]
    dx = jnp.arange(-Rx, Rx + 1, dtype=jnp.int32)[None, None, :]
    zg = z + dz; yg = y + dy; xg = x + dx
    in_im = ((xg >= 1) & (xg <= nx - 2) & (yg >= 1) & (yg <= ny - 2) &
             (zg >= 1) & (zg <= nz - 2))

    ddx = (dx.astype(jnp.float32) * ux)
    ddy = (dy.astype(jnp.float32) * uy)
    ddz = (dz.astype(jnp.float32) * uz)
    sq_dist = ddx * ddx + ddy * ddy + ddz * ddz
    rad32 = jnp.float32(rad)
    mask = in_im & (sq_dist <= rad32 * rad32)

    # Central-difference gradient with physical-unit correction
    # (IM_GET_GRAD_ISO: 0.5f*(I[+1]-I[-1]) * (1.0f/u)).
    inv_ux = np.float32(1.0) / ux
    inv_uy = np.float32(1.0) / uy
    inv_uz = np.float32(1.0) / uz
    gx = jnp.float32(0.5) * (win[1:-1, 1:-1, 2:] - win[1:-1, 1:-1, :-2]) * inv_ux
    gy = jnp.float32(0.5) * (win[1:-1, 2:, 1:-1] - win[1:-1, :-2, 1:-1]) * inv_uy
    gz = jnp.float32(0.5) * (win[2:, 1:-1, 1:-1] - win[:-2, 1:-1, 1:-1]) * inv_uz

    sig32 = jnp.float32(sigma)
    w = jnp.exp(jnp.float32(-0.5) * sq_dist / (sig32 * sig32))
    w = jnp.where(mask, w, jnp.float32(0))

    gx64 = gx.astype(f64()); gy64 = gy.astype(f64()); gz64 = gz.astype(f64())
    w64 = w.astype(f64())
    A = jnp.stack([
        jnp.sum(gx64 * gx64 * w64), jnp.sum(gx64 * gy64 * w64),
        jnp.sum(gx64 * gz64 * w64), jnp.sum(gy64 * gy64 * w64),
        jnp.sum(gy64 * gz64 * w64), jnp.sum(gz64 * gz64 * w64)])
    vd_win = jnp.stack([jnp.sum(gx * w), jnp.sum(gy * w), jnp.sum(gz * w)])
    return A, vd_win


def assign_orientations_level(level: jax.Array, zyx: jax.Array,
                              sd: float, units: tuple[float, float, float],
                              corner_thresh: float, chunk: int = 256):
    """Assign orientations to all keypoints of one level.

    Args:
      level: (nz, ny, nx) Gaussian pyramid level.
      zyx: (K, 3) int32 keypoint voxel coords.
      sd: the level's absolute scale (shared by every keypoint on it).
      units: level units (ux, uy, uz).
      corner_thresh: rejection threshold on the corner score.

    Returns:
      R: (K, 3, 3) float32 rotation matrices.
      valid: (K,) bool - keypoints that were not rejected.
    """
    nz, ny, nx = level.shape
    sigma = ORI_SIG_FCTR * sd
    rad = sigma * ORI_RAD_FCTR
    Rx, Ry, Rz = window_radii(rad, units)
    padded = jnp.pad(level, ((Rz + 1, Rz + 1), (Ry + 1, Ry + 1),
                             (Rx + 1, Rx + 1)))

    def one(row):
        return _window_terms(padded, row, (Rx, Ry, Rz), units, rad, sigma,
                             (nx, ny, nz))

    K = zyx.shape[0]
    pad_k = (-K) % chunk
    zyx_p = jnp.concatenate([zyx, jnp.zeros((pad_k, 3), zyx.dtype)])
    A6, vd = jax.lax.map(jax.vmap(one),
                         zyx_p.reshape(-1, chunk, 3))
    A6 = A6.reshape(-1, 6)[:K]
    vd = vd.reshape(-1, 3)[:K]
    return orientations_from_tensor(A6, vd, corner_thresh)


def orientations_from_tensor(A6: jax.Array, vd: jax.Array,
                             corner_thresh: float):
    """Eigendecomposition + sign fixing + corner test (sift.c:1430-1492)."""
    axx, axy, axz, ayy, ayz, azz = [A6[:, i] for i in range(6)]
    A = jnp.stack([
        jnp.stack([axx, axy, axz], -1),
        jnp.stack([axy, ayy, ayz], -1),
        jnp.stack([axz, ayz, azz], -1)], -2)
    lam, Q = jnp.linalg.eigh(A)     # ascending eigenvalues

    grad_ok = (vd[:, 0] * vd[:, 0] + vd[:, 1] * vd[:, 1] +
               vd[:, 2] * vd[:, 2]) >= jnp.float32(ORI_GRAD_THRESH)

    # Stability: reject if |lam[i] / lam[i+1]| > 0.90. NaN comparisons are
    # false, matching the C semantics of fabs(nan) > thresh.
    r0 = jnp.abs(lam[:, 0] / lam[:, 1]) > MAX_EIG_RATIO
    r1 = jnp.abs(lam[:, 1] / lam[:, 2]) > MAX_EIG_RATIO
    ratio_reject = r0 | r1

    vd32 = vd.astype(jnp.float32)
    vd_norm = jnp.sqrt(jnp.sum(vd32 * vd32, axis=-1))

    cols = []
    cos_abs = []
    for i in range(2):
        eig_idx = 2 - i
        v = Q[:, :, eig_idx].astype(jnp.float32)
        d = jnp.sum(vd32 * v, axis=-1)
        v_norm = jnp.sqrt(jnp.sum(v * v, axis=-1))
        cos_ang = d.astype(f64()) / (v_norm * vd_norm).astype(f64())
        cos_abs.append(jnp.abs(cos_ang))
        sgn = jnp.where(d > 0, jnp.float32(1), jnp.float32(-1))
        cols.append(v * sgn[:, None])
    corner_score = jnp.minimum(cos_abs[0], cos_abs[1])
    v2 = jnp.cross(cols[0], cols[1])
    R = jnp.stack([cols[0], cols[1], v2], axis=-1)  # columns as reference

    valid = grad_ok & ~ratio_reject & (corner_score >= corner_thresh)
    return R, valid
