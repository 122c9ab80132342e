"""SIFT3D descriptor extraction.

Reproduces extract_descrip (reference sift3d/sift.c:1834-1928) and its
driver _SIFT3D_extract_descriptors (sift.c:2207-2243):

- window = sphere of radius 2 * sigma, sigma = sd * 5*sqrt(2), in real-world
  units around the keypoint (sift.c:1845-1846);
- displacements rotated into the keypoint frame by R^T; 4x4x4 spatial bins
  of half-width win_radius/sqrt(2) (sift.c:1847-1884);
- Gaussian-weighted, unit-corrected gradients rotated by R^T, accumulated by
  trilinear spatial x 3-vertex barycentric icosahedral interpolation
  (SIFT3D_desc_acc_interp, sift.c:1687-1791);
- normalize -> truncate at 0.2*128/768 -> renormalize (sift.c:1794-1821,
  1909-1918); coordinates written back at base-octave scale (sift.c:1920).

TPU mapping: keypoints are bucketed by pyramid level (every keypoint of a
level shares its window geometry), each bucket is a batched dynamic-slice
gather, and the histogram scatter becomes an einsum of a (V, 64) trilinear
spatial weight matrix against a (V, 12) barycentric vertex weight matrix -
an MXU matmul instead of the reference's scalar 8x3-way scatter.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (DESC_NUM_TOTAL_HIST, DESC_NUMEL, DESC_RAD_FCTR,
                      DESC_SIG_FCTR, HIST_NUMEL, NHIST_PER_DIM, TRUNC_THRESH)
from ..dtypes import f64
from ..ops.geometry import icos_hist_bin, vertex_weights
from .keypoints import Keypoints
from .windows import gather_window, window_extent, window_gradients

_DBL_EPSILON = 2.220446049250313e-16


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Descriptors:
    """Padded descriptor set (reference SIFT3D_Descriptor, imtypes.h:291-296).

    Coordinates are in base-octave (image) space.
    """
    xyz: jax.Array   # (K, 3) f64
    sd: jax.Array    # (K,) f64
    vec: jax.Array   # (K, 768) f32
    count: jax.Array  # () i32

    @property
    def capacity(self) -> int:
        return self.vec.shape[0]

    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.count

    def to_numpy(self) -> np.ndarray:
        """Rows [x y z el0..el767] float32, matching the reference CSV
        format (SIFT3D_Descriptor_store_to_Mat_rm, sift.c:2664-2717)."""
        n = int(self.count)
        out = np.zeros((n, 3 + DESC_NUMEL), np.float32)
        out[:, :3] = np.asarray(self.xyz)[:n]
        out[:, 3:] = np.asarray(self.vec)[:n]
        return out


def _descrip_window(level, center_zyx, R, radii, cores, units, sigma, rad):
    """Histogram for one keypoint: returns (64*12,) f32 raw (unnormalized)."""
    nz, ny, nx = level.shape
    ux = np.float32(units[0]); uy = np.float32(units[1])
    uz = np.float32(units[2])

    cz, cy, cx = center_zyx[0], center_zyx[1], center_zyx[2]
    bz = jnp.floor(cz).astype(jnp.int32)
    by = jnp.floor(cy).astype(jnp.int32)
    bx = jnp.floor(cx).astype(jnp.int32)
    win, (sz, sy, sx) = gather_window(level, (bz, by, bx), radii, cores)
    ckz, cky, ckx = cores

    zg = (sz + jnp.arange(ckz, dtype=jnp.int32))[:, None, None]
    yg = (sy + jnp.arange(cky, dtype=jnp.int32))[None, :, None]
    xg = (sx + jnp.arange(ckx, dtype=jnp.int32))[None, None, :]

    # Real-world displacement from the (possibly fractional) center
    # (IM_LOOP_SPHERE_START, sift.c:112-115). Core voxels are inside
    # [1, n-2] by construction; the sphere test is the remaining mask.
    vx = (xg.astype(jnp.float32) - cx.astype(jnp.float32)) * ux
    vy = (yg.astype(jnp.float32) - cy.astype(jnp.float32)) * uy
    vz = (zg.astype(jnp.float32) - cz.astype(jnp.float32)) * uz
    sq_dist = vx * vx + vy * vy + vz * vz
    rad32 = jnp.float32(rad)
    mask = sq_dist <= rad32 * rad32

    # Rotate displacement into the keypoint frame: vkp = R^T v
    Rt = R.T.astype(jnp.float32)
    kx = Rt[0, 0] * vx + Rt[0, 1] * vy + Rt[0, 2] * vz
    ky = Rt[1, 0] * vx + Rt[1, 1] * vy + Rt[1, 2] * vz
    kz = Rt[2, 0] * vx + Rt[2, 1] * vy + Rt[2, 2] * vz

    sig32 = jnp.float32(sigma)
    half_width = rad32 / jnp.float32(math.sqrt(2))
    bin_fctr = jnp.float32(1.0) / (jnp.float32(2.0) * half_width /
                                   jnp.float32(NHIST_PER_DIM))
    vbx = (kx + half_width) * bin_fctr
    vby = (ky + half_width) * bin_fctr
    vbz = (kz + half_width) * bin_fctr
    nh = jnp.float32(NHIST_PER_DIM)
    inside = ((vbx >= 0) & (vby >= 0) & (vbz >= 0) &
              (vbx < nh) & (vby < nh) & (vbz < nh))

    # Unit-corrected gradient, Gaussian-weighted, rotated to keypoint frame
    gx, gy, gz = window_gradients(win, units)
    weight = jnp.exp(jnp.float32(-0.5) * sq_dist / (sig32 * sig32))
    gx = gx * weight; gy = gy * weight; gz = gz * weight
    grx = Rt[0, 0] * gx + Rt[0, 1] * gy + Rt[0, 2] * gz
    gry = Rt[1, 0] * gx + Rt[1, 1] * gy + Rt[1, 2] * gz
    grz = Rt[2, 0] * gx + Rt[2, 1] * gy + Rt[2, 2] * gz

    V = ckz * cky * ckx
    grad_rot = jnp.stack([grx.reshape(V), gry.reshape(V), grz.reshape(V)], -1)
    face, bary, ok = icos_hist_bin(grad_rot)
    mag = jnp.sqrt(jnp.sum(grad_rot * grad_rot, -1))

    total_mask = (mask & inside).reshape(V) & ok
    Gmat = vertex_weights(face, bary)                    # (V, 12)
    Gmat = Gmat * (mag * total_mask.astype(jnp.float32))[:, None]

    # Trilinear spatial weights over the 4^3 histogram grid
    # (SIFT3D_desc_acc_interp, sift.c:1732-1755).
    def axis_w(vb):
        flo = jnp.floor(vb)
        fr = (vb - flo).reshape(V)
        flo = flo.reshape(V).astype(jnp.int32)
        b = jnp.arange(NHIST_PER_DIM, dtype=jnp.int32)
        return ((flo[:, None] == b[None, :]) * (1.0 - fr[:, None]) +
                ((flo[:, None] + 1) == b[None, :]) * fr[:, None]
                ).astype(jnp.float32)
    wx = axis_w(vbx); wy = axis_w(vby); wz = axis_w(vbz)
    S = (wz[:, :, None, None] * wy[:, None, :, None] *
         wx[:, None, None, :]).reshape(V, DESC_NUM_TOTAL_HIST)

    hist = jnp.einsum("vh,vb->hb", S, Gmat,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (64, 12)
    return hist.reshape(DESC_NUMEL)


def postprocess(raw: jax.Array) -> jax.Array:
    """normalize -> truncate -> normalize (sift.c:1794-1821, 1909-1918)."""
    def normalize(v):
        norm = jnp.sqrt(jnp.sum(v.astype(f64()) ** 2, -1,
                                keepdims=True)) + _DBL_EPSILON
        inv = (1.0 / norm).astype(jnp.float32)
        return v * inv
    v = normalize(raw)
    v = jnp.minimum(v, jnp.float32(TRUNC_THRESH))
    return normalize(v)


def _pallas_vmem_ok(cores, nx: int) -> bool:
    """Whether the Pallas window kernel's scratch fits comfortably in VMEM."""
    ckz, cky, ckx = cores
    x_pad = -(-ckx // 128) * 128
    win = (ckz + 2) * (cky + 2) * (-(-(ckx + 2) // 128) * 128) * 4
    plane = (16 + 48) * cky * x_pad * 4        # W/T accumulation scratch
    return win + plane < 12 * 1024 * 1024


def extract_level(level: jax.Array, centers_zyx: jax.Array, R: jax.Array,
                  sd: float, units: tuple[float, float, float],
                  chunk: int = 32, count: jax.Array | None = None,
                  use_pallas: bool | None = None,
                  interpret: bool = False) -> jax.Array:
    """Descriptors for all keypoints of one level. centers_zyx float (K, 3).

    ``use_pallas`` selects the Pallas window kernel (ops/pallas_window.py):
    default on TPU when the window scratch fits VMEM. ``count`` (traced)
    lets the kernel skip padded bucket rows entirely; rows >= count then
    hold garbage, which callers mask out.
    """
    nz, ny, nx = level.shape
    sigma = np.float32(sd) * np.float32(DESC_SIG_FCTR)
    rad = np.float32(DESC_RAD_FCTR) * sigma
    Rx = int(math.ceil(float(rad) / units[0]))
    Ry = int(math.ceil(float(rad) / units[1]))
    Rz = int(math.ceil(float(rad) / units[2]))
    radii = (Rz, Ry, Rx)
    cores = (window_extent(Rz, nz, False), window_extent(Ry, ny, False),
             window_extent(Rx, nx, False))

    if use_pallas is None:
        import os
        use_pallas = (jax.default_backend() == "tpu" and
                      _pallas_vmem_ok(cores, nx) and
                      not os.environ.get("SIFT3D_TPU_NO_PALLAS_WINDOW"))
    if use_pallas or interpret:
        from ..ops.pallas_window import descrip_level_pallas
        if count is None:
            count = jnp.int32(centers_zyx.shape[0])
        raw = descrip_level_pallas(
            level, centers_zyx, R, count, radii, cores, units,
            float(sigma), float(rad), interpret=interpret)
        return postprocess(raw)

    def one(args):
        c, r = args
        return _descrip_window(level, c, r, radii, cores, units,
                               float(sigma), float(rad))

    K = centers_zyx.shape[0]
    chunk = min(chunk, K)
    if chunk <= 1:
        # Sequential map: the window slice stays a true dynamic-slice
        # (vmapping it lowers to a TPU gather, which is much slower).
        raw = jax.lax.map(one, (centers_zyx, R))
    else:
        pad_k = (-K) % chunk
        c_p = jnp.concatenate(
            [centers_zyx, jnp.zeros((pad_k, 3), centers_zyx.dtype)])
        R_p = jnp.concatenate(
            [R, jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (pad_k, 3, 3))])
        raw = jax.lax.map(
            jax.vmap(one),
            (c_p.reshape(-1, chunk, 3), R_p.reshape(-1, chunk, 3, 3)))
        raw = raw.reshape(-1, DESC_NUMEL)[:K]
    return postprocess(raw)


def extract_descriptors(gpyr: dict, kp: Keypoints, plan,
                        params, chunk: int = 32,
                        level_caps: dict | None = None) -> Descriptors:
    """Descriptors from the detection pyramid (SIFT3D_extract_descriptors,
    sift.c:2025-2046). Keypoint rows keep their order.

    ``level_caps`` optionally bounds the bucket size per (o, s) level -
    the host picks pow2-of-actual-count caps (api.Sift3D.extract) so the
    windowed gathers scale with real per-level keypoint counts.
    """
    K = kp.capacity
    vec = jnp.zeros((K, DESC_NUMEL), jnp.float32)
    valid = kp.valid_mask()
    s_start = plan.first_level + 1
    s_end = plan.last_dog_level - 1

    from .detect import level_cap as _level_cap

    for o in range(plan.num_octaves):
        units_o = plan.octave_units(o)
        for s in range(s_start, s_end + 1):
            cap = min(_level_cap(plan, o, params), K)
            if level_caps is not None:
                cap = min(cap, level_caps[(o, s)])
            if cap <= 0:
                continue
            sel = valid & (kp.o == o) & (kp.s == s)
            # Compact up to `cap` bucket rows (order preserved).
            pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
            dest = jnp.where(sel & (pos < cap), pos, cap)
            rows = jnp.zeros(cap + 1, jnp.int32).at[dest].set(
                jnp.arange(K, dtype=jnp.int32))[:cap]
            n_in_bucket = jnp.minimum(pos[-1] + 1, cap)
            centers = jnp.stack(
                [kp.z[rows], kp.y[rows], kp.x[rows]], -1
            ).astype(jnp.float32)
            Rb = kp.R[rows]
            geom = plan.gpyr_level(o, s)
            desc_b = extract_level(gpyr[(o, s)], centers, Rb, geom.scale,
                                   units_o, chunk, count=n_in_bucket)
            # Scatter back to the original rows; drop padding rows.
            bucket_valid = jnp.arange(cap) < n_in_bucket
            safe_rows = jnp.where(bucket_valid, rows, K)
            vec = vec.at[safe_rows].set(
                jnp.where(bucket_valid[:, None], desc_b, 0),
                mode="drop")

    factor = jnp.exp2(kp.o.astype(f64()))
    xyz = jnp.stack([kp.x * factor, kp.y * factor, kp.z * factor], -1)
    return Descriptors(xyz=xyz, sd=kp.sd, vec=vec, count=kp.count)


def extract_raw_descriptors(vol: jax.Array, kp: Keypoints,
                            units: tuple[float, float, float],
                            plan, params, chunk: int = 32) -> Descriptors:
    """Descriptors from a raw image instead of a stored pyramid
    (SIFT3D_extract_raw_descriptors, reference sift.c:2131-2195).

    The image is smoothed from sigma_n to sigma0 and scaled to [-1, 1]
    (smooth_scale_raw_input, sift.c:1978-2006); keypoints are converted to
    the base octave by scaling coordinates by 2^o with sd *unchanged*
    (keypoint2base / scale_Keypoint, sift.c:2094-2115, 1952-1967), so each
    original (o, s) bucket keeps its own window size - now measured in
    base-octave voxels on the single smoothed image.
    """
    from .dense import smooth_scale_raw_input

    smoothed = smooth_scale_raw_input(vol, units, params)
    K = kp.capacity
    vec = jnp.zeros((K, DESC_NUMEL), jnp.float32)
    valid = kp.valid_mask()
    s_start = plan.first_level + 1
    s_end = plan.last_dog_level - 1
    from .detect import level_cap as _level_cap

    for o in range(plan.num_octaves):
        factor = np.float32(2.0 ** o)
        cap = min(_level_cap(plan, o, params), K)
        for s in range(s_start, s_end + 1):
            sel = valid & (kp.o == o) & (kp.s == s)
            pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
            dest = jnp.where(sel & (pos < cap), pos, cap)
            rows = jnp.zeros(cap + 1, jnp.int32).at[dest].set(
                jnp.arange(K, dtype=jnp.int32))[:cap]
            n_in_bucket = jnp.minimum(pos[-1] + 1, cap)
            centers = jnp.stack(
                [kp.z[rows], kp.y[rows], kp.x[rows]], -1
            ).astype(jnp.float32) * factor
            Rb = kp.R[rows]
            geom = plan.gpyr_level(o, s)
            desc_b = extract_level(smoothed, centers, Rb, geom.scale,
                                   units, chunk, count=n_in_bucket)
            bucket_valid = jnp.arange(cap) < n_in_bucket
            safe_rows = jnp.where(bucket_valid, rows, K)
            vec = vec.at[safe_rows].set(
                jnp.where(bucket_valid[:, None], desc_b, 0),
                mode="drop")

    f2 = jnp.exp2(kp.o.astype(f64()))
    xyz = jnp.stack([kp.x * f2, kp.y * f2, kp.z * f2], -1)
    return Descriptors(xyz=xyz, sd=kp.sd, vec=vec, count=kp.count)
