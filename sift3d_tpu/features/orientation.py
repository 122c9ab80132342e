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
the same fixed window box - so the sphere gather becomes a batched clamped
dynamic-slice and the reductions become masked sums. Eigendecomposition is
a batched closed-form 3x3 solve.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAX_EIG_RATIO, ORI_GRAD_THRESH, ORI_SIG_FCTR, ORI_RAD_FCTR
from ..dtypes import f64
from ..ops.eig import eigh3x3
from .windows import gather_window, window_extent, window_gradients


def window_radii(rad: float, units: tuple[float, float, float],
                 ) -> tuple[int, int, int]:
    """Per-dimension voxel half-extents of the sphere's bounding box."""
    return tuple(int(math.ceil(np.float32(rad) / np.float32(u)))
                 for u in units)


def _window_terms(level, zyx, radii, cores, units, rad, sigma):
    """Gather one keypoint's window and compute masked tensor sums.

    Returns (A(6,) f64 upper-triangle terms, vd_win(3,) f32).
    """
    nz, ny, nx = level.shape
    ux = np.float32(units[0]); uy = np.float32(units[1])
    uz = np.float32(units[2])
    win, (sz, sy, sx) = gather_window(
        level, (zyx[0], zyx[1], zyx[2]), radii, cores)
    cz, cy, cx = cores

    iz = (sz + jnp.arange(cz, dtype=jnp.int32))[:, None, None]
    iy = (sy + jnp.arange(cy, dtype=jnp.int32))[None, :, None]
    ix = (sx + jnp.arange(cx, dtype=jnp.int32))[None, None, :]
    Rz, Ry, Rx = radii
    in_box = ((ix >= zyx[2] - Rx) & (ix <= zyx[2] + Rx) &
              (iy >= zyx[1] - Ry) & (iy <= zyx[1] + Ry) &
              (iz >= zyx[0] - Rz) & (iz <= zyx[0] + Rz))

    ddx = (ix - zyx[2]).astype(jnp.float32) * ux
    ddy = (iy - zyx[1]).astype(jnp.float32) * uy
    ddz = (iz - zyx[0]).astype(jnp.float32) * uz
    sq_dist = ddx * ddx + ddy * ddy + ddz * ddz
    rad32 = jnp.float32(rad)
    mask = in_box & (sq_dist <= rad32 * rad32)

    gx, gy, gz = window_gradients(win, units)

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
                              corner_thresh: float, chunk: int = 128,
                              return_conf: bool = False,
                              count: jax.Array | None = None,
                              use_pallas: bool | None = None,
                              interpret: bool = False):
    """Assign orientations to all keypoints of one level.

    Args:
      level: (nz, ny, nx) Gaussian pyramid level.
      zyx: (K, 3) int32 keypoint voxel coords.
      sd: the level's absolute scale (shared by every keypoint on it).
      units: level units (ux, uy, uz).
      corner_thresh: rejection threshold on the corner score.
      count: optional () i32 - rows >= count are bucket padding; the
        Pallas path skips their windows entirely (they return invalid).
      use_pallas: select the Pallas window kernel (ops/pallas_orient.py);
        default on TPU when the window block fits VMEM. The XLA path
        accumulates the structure tensor in f64 where x64 is on; the
        Pallas path is f32 (like every TPU bench configuration).

    Returns:
      R: (K, 3, 3) float32 rotation matrices.
      valid: (K,) bool - keypoints that were not rejected.
    """
    nz, ny, nx = level.shape
    sigma = ORI_SIG_FCTR * sd
    rad = sigma * ORI_RAD_FCTR
    radii = window_radii(rad, units)
    Rx, Ry, Rz = radii
    cores = (window_extent(Rz, nz, True), window_extent(Ry, ny, True),
             window_extent(Rx, nx, True))
    K = zyx.shape[0]

    if use_pallas is None:
        import os

        from ..ops.pallas_orient import orient_vmem_ok
        # Default OFF: measured on the chip (benches/profile_windows.py,
        # B=64 config-4 batch), the XLA gather path runs the orientation
        # stage in 0.325 s vs 0.791 s for the Pallas kernel - the
        # 9-plane scratch read-modify-write per z-step costs more than
        # XLA's chunked fused reductions. Opt in to the kernel with
        # SIFT3D_TPU_PALLAS_ORIENT=1 (it stays interpret-tested).
        use_pallas = (jax.default_backend() == "tpu" and
                      orient_vmem_ok(cores) and
                      bool(os.environ.get("SIFT3D_TPU_PALLAS_ORIENT")))
    if use_pallas or interpret:
        from ..ops.pallas_orient import orient_terms_pallas
        A6, vd = orient_terms_pallas(
            level, zyx, K if count is None else count,
            (Rz, Ry, Rx), cores, units, float(sigma), float(rad),
            interpret=interpret)
    else:
        def one(row):
            return _window_terms(level, row, (Rz, Ry, Rx), cores, units,
                                 rad, sigma)

        chunk = min(chunk, K)
        pad_k = (-K) % chunk
        zyx_p = jnp.concatenate(
            [zyx, jnp.ones((pad_k, 3), zyx.dtype)])
        A6, vd = jax.lax.map(jax.vmap(one), zyx_p.reshape(-1, chunk, 3))
        A6 = A6.reshape(-1, 6)[:K]
        vd = vd.reshape(-1, 3)[:K]
    R, valid, conf = orientations_from_tensor(A6, vd, corner_thresh,
                                              return_conf=True)
    if count is not None:
        valid = valid & (jnp.arange(K) < count)
    return (R, valid, conf) if return_conf else (R, valid)


def assign_orientations_raw(vol: jax.Array, kp, units, plan, params,
                            chunk: int = 128):
    """Orientations from a raw image + keypoint list
    (SIFT3D_assign_orientations, reference sift.c:1534-1607).

    The image is smoothed sigma_n -> sigma0 and scaled; keypoints convert
    to the base octave (coords x 2^o, sd unchanged) and the structure
    tensor is computed on the single smoothed image. Rejected keypoints
    keep R = I with confidence -1, like the reference.

    Returns (R (K, 3, 3) f32, conf (K,) f32).
    """
    from .dense import smooth_scale_raw_input

    smoothed = smooth_scale_raw_input(vol, units, params)
    K = kp.capacity
    R_out = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3))
    conf_out = jnp.full((K,), -1.0, jnp.float32)
    valid_kp = kp.valid_mask()

    s_start = plan.first_level + 1
    s_end = plan.last_dog_level - 1
    for o in range(plan.num_octaves):
        factor = np.float32(2.0 ** o)
        for s in range(s_start, s_end + 1):
            sel = valid_kp & (kp.o == o) & (kp.s == s)
            zyx = jnp.stack([kp.z, kp.y, kp.x], -1).astype(jnp.float32)
            zyx_b = jnp.floor(zyx * factor).astype(jnp.int32)
            geom = plan.gpyr_level(o, s)
            R, valid, conf = assign_orientations_level(
                smoothed, zyx_b, geom.scale, units, params.corner_thresh,
                chunk=chunk, return_conf=True)
            use = sel & valid
            R_out = jnp.where(use[:, None, None], R, R_out)
            conf_out = jnp.where(sel, jnp.where(valid, conf, -1.0),
                                 conf_out)
    return R_out, conf_out


def orientations_from_tensor(A6: jax.Array, vd: jax.Array,
                             corner_thresh: float,
                             return_conf: bool = False):
    """Eigendecomposition + sign fixing + corner test (sift.c:1430-1492)."""
    axx, axy, axz, ayy, ayz, azz = [A6[:, i] for i in range(6)]
    A = jnp.stack([
        jnp.stack([axx, axy, axz], -1),
        jnp.stack([axy, ayy, ayz], -1),
        jnp.stack([axz, ayz, azz], -1)], -2)
    lam, Q = eigh3x3(A)             # ascending eigenvalues

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
    if return_conf:
        return R, valid, corner_score.astype(jnp.float32)
    return R, valid
