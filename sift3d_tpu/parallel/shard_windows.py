"""Z-sharded windowed feature stages (SURVEY §5.7 back half).

Orientation windows (radius 3*1.5*sd mm) and descriptor windows (radius
2*7.07*sd mm) span most of a volume at octave 0, so the halo-replication
strategy used for convolution (shard_conv) degenerates: the halo would be
wider than the shard. The TPU-native decomposition is different: both
stages are *sums over window voxels* - the 3x3 structure tensor / window
gradient (assign_eig_ori, reference sift3d/sift.c:1354-1514) and the
64x12 descriptor histogram (extract_descrip, sift.c:1834-1928) - so each
z-shard accumulates the partial sum over its own z rows (plus a 1-voxel
ppermute gradient halo) and the partials meet in a tiny `psum` over the
"space" axis: (K, 6)+(K, 3) for orientation, (K, 768) for descriptors.
No window voxel is ever replicated across shards; keypoints (a few dozen
scalars each) are replicated instead of exchanged.

The per-voxel math mirrors features/orientation._window_terms and
features/descriptor._descrip_window row-for-row; equality with the
unsharded path is pinned by tests/test_shard_windows.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import (DESC_NUM_TOTAL_HIST, DESC_NUMEL, DESC_RAD_FCTR,
                      DESC_SIG_FCTR, NHIST_PER_DIM)
from ..dtypes import f64
from ..features.descriptor import postprocess
from ..features.orientation import (orientations_from_tensor, window_radii)
from ..features.windows import (window_extent, window_gradients,
                                window_start)
from ..ops.geometry import icos_hist_bin, vertex_weights
from .shard_conv import shard_halo


def _local_window(block_ext, sy, sx, cy, cx):
    """(S+2, cy+2, cx+2) window: all local z rows, dynamic (y, x) core."""
    # The z start must share sy/sx's dtype: a python 0 weak-types to
    # int64 under x64, which lax.dynamic_slice rejects.
    z0 = jnp.zeros((), sy.dtype)
    return jax.lax.dynamic_slice(
        block_ext, (z0, sy - 1, sx - 1),
        (block_ext.shape[0], cy + 2, cx + 2))


def orient_level_z_sharded(level: jax.Array, zyx: jax.Array, sd: float,
                           units, corner_thresh: float, mesh: Mesh,
                           axis_name: str = "space",
                           batch_axis_name: str = "data"):
    """Orientations for one level's keypoints, windows partitioned over z.

    Args:
      level: (B, nz, ny, nx) batched level, z sharded over ``axis_name``.
      zyx: (B, K, 3) int32 keypoint voxel coords (replicated over z).
    Returns (R (B, K, 3, 3) f32, valid (B, K) bool), replicated over z.
    """
    from ..config import ORI_RAD_FCTR, ORI_SIG_FCTR

    B, nz, ny, nx = level.shape
    sigma = ORI_SIG_FCTR * sd
    rad = sigma * ORI_RAD_FCTR
    Rx, Ry, Rz = window_radii(rad, units)
    cz = window_extent(Rz, nz, True)
    cy = window_extent(Ry, ny, True)
    cx = window_extent(Rx, nx, True)
    ux, uy, uz = (np.float32(u) for u in units)
    n_sh = mesh.shape[axis_name]
    S = nz // n_sh
    assert S * n_sh == nz, (nz, n_sh)

    def local(block, zyx_l):
        z0 = jax.lax.axis_index(axis_name) * S
        block_ext = shard_halo(block, 1, axis_name, z_axis=1)  # (Bl,S+2,..)

        def one(ext_v, row):
            sz = window_start(row[0], Rz, cz, nz)          # global clamp
            sy = window_start(row[1], Ry, cy, ny)
            sx = window_start(row[2], Rx, cx, nx)
            win = _local_window(ext_v, sy, sx, cy, cx)
            # Global z of each local core row; owned = inside the global
            # core range [sz, sz + cz).
            zg = (z0 + jnp.arange(S, dtype=jnp.int32))[:, None, None]
            iy = (sy + jnp.arange(cy, dtype=jnp.int32))[None, :, None]
            ix = (sx + jnp.arange(cx, dtype=jnp.int32))[None, None, :]
            owned = (zg >= sz) & (zg < sz + cz)
            in_box = ((ix >= row[2] - Rx) & (ix <= row[2] + Rx) &
                      (iy >= row[1] - Ry) & (iy <= row[1] + Ry) &
                      (zg >= row[0] - Rz) & (zg <= row[0] + Rz))
            ddx = (ix - row[2]).astype(jnp.float32) * ux
            ddy = (iy - row[1]).astype(jnp.float32) * uy
            ddz = (zg - row[0]).astype(jnp.float32) * uz
            sq = ddx * ddx + ddy * ddy + ddz * ddz
            mask = owned & in_box & (sq <= jnp.float32(rad) ** 2)
            gx, gy, gz = window_gradients(win, units)
            w = jnp.exp(jnp.float32(-0.5) * sq /
                        jnp.float32(sigma) ** 2)
            w = jnp.where(mask, w, jnp.float32(0))
            gx64 = gx.astype(f64()); gy64 = gy.astype(f64())
            gz64 = gz.astype(f64()); w64 = w.astype(f64())
            A = jnp.stack([
                jnp.sum(gx64 * gx64 * w64), jnp.sum(gx64 * gy64 * w64),
                jnp.sum(gx64 * gz64 * w64), jnp.sum(gy64 * gy64 * w64),
                jnp.sum(gy64 * gz64 * w64), jnp.sum(gz64 * gz64 * w64)])
            vd = jnp.stack([jnp.sum(gx * w), jnp.sum(gy * w),
                            jnp.sum(gz * w)])
            return A, vd

        A6, vd = jax.vmap(jax.vmap(one, in_axes=(None, 0)))(block_ext,
                                                            zyx_l)
        return (jax.lax.psum(A6, axis_name),
                jax.lax.psum(vd, axis_name))

    A6, vd = shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis_name, axis_name, None, None),
                  P(batch_axis_name)),
        out_specs=(P(batch_axis_name), P(batch_axis_name)),
        check_vma=False,
    )(level, zyx)
    R, valid = jax.vmap(
        lambda a, v: orientations_from_tensor(a, v, corner_thresh))(A6, vd)
    return R, valid


def descrip_level_z_sharded(level: jax.Array, centers_zyx: jax.Array,
                            Rmat: jax.Array, sd: float, units,
                            mesh: Mesh, axis_name: str = "space",
                            batch_axis_name: str = "data") -> jax.Array:
    """Descriptors for one level's keypoints, windows partitioned over z.

    Args:
      level: (B, nz, ny, nx) batched level, z sharded over ``axis_name``.
      centers_zyx: (B, K, 3) f32 fractional centers; Rmat: (B, K, 3, 3).
    Returns (B, K, 768) f32 postprocessed descriptors, z-replicated.
    """
    B, nz, ny, nx = level.shape
    sigma = np.float32(sd) * np.float32(DESC_SIG_FCTR)
    rad = np.float32(DESC_RAD_FCTR) * sigma
    Rz = int(math.ceil(float(rad) / units[2]))
    Ry = int(math.ceil(float(rad) / units[1]))
    Rx = int(math.ceil(float(rad) / units[0]))
    cz = window_extent(Rz, nz, False)
    cy = window_extent(Ry, ny, False)
    cx = window_extent(Rx, nx, False)
    ux, uy, uz = (np.float32(u) for u in units)
    n_sh = mesh.shape[axis_name]
    S = nz // n_sh
    assert S * n_sh == nz, (nz, n_sh)

    def local(block, centers_l, R_l):
        z0 = jax.lax.axis_index(axis_name) * S
        block_ext = shard_halo(block, 1, axis_name, z_axis=1)

        def one(ext_v, c, Rk):
            czf, cyf, cxf = c[0], c[1], c[2]
            bz = jnp.floor(czf).astype(jnp.int32)
            by = jnp.floor(cyf).astype(jnp.int32)
            bx = jnp.floor(cxf).astype(jnp.int32)
            sz = window_start(bz, Rz, cz, nz)
            sy = window_start(by, Ry, cy, ny)
            sx = window_start(bx, Rx, cx, nx)
            win = _local_window(ext_v, sy, sx, cy, cx)
            zg = (z0 + jnp.arange(S, dtype=jnp.int32))[:, None, None]
            yg = (sy + jnp.arange(cy, dtype=jnp.int32))[None, :, None]
            xg = (sx + jnp.arange(cx, dtype=jnp.int32))[None, None, :]
            owned = (zg >= sz) & (zg < sz + cz)

            vx = (xg.astype(jnp.float32) - cxf.astype(jnp.float32)) * ux
            vy = (yg.astype(jnp.float32) - cyf.astype(jnp.float32)) * uy
            vz = (zg.astype(jnp.float32) - czf.astype(jnp.float32)) * uz
            sq = vx * vx + vy * vy + vz * vz
            rad32 = jnp.float32(rad)
            mask = owned & (sq <= rad32 * rad32)

            Rt = Rk.T.astype(jnp.float32)
            kx = Rt[0, 0] * vx + Rt[0, 1] * vy + Rt[0, 2] * vz
            ky = Rt[1, 0] * vx + Rt[1, 1] * vy + Rt[1, 2] * vz
            kz = Rt[2, 0] * vx + Rt[2, 1] * vy + Rt[2, 2] * vz

            half_width = rad32 / jnp.float32(math.sqrt(2))
            bin_fctr = jnp.float32(1.0) / (jnp.float32(2.0) * half_width /
                                           jnp.float32(NHIST_PER_DIM))
            vbx = (kx + half_width) * bin_fctr
            vby = (ky + half_width) * bin_fctr
            vbz = (kz + half_width) * bin_fctr
            nh = jnp.float32(NHIST_PER_DIM)
            inside = ((vbx >= 0) & (vby >= 0) & (vbz >= 0) &
                      (vbx < nh) & (vby < nh) & (vbz < nh))

            gx, gy, gz = window_gradients(win, units)
            weight = jnp.exp(jnp.float32(-0.5) * sq /
                             (jnp.float32(sigma) ** 2))
            gx = gx * weight; gy = gy * weight; gz = gz * weight
            grx = Rt[0, 0] * gx + Rt[0, 1] * gy + Rt[0, 2] * gz
            gry = Rt[1, 0] * gx + Rt[1, 1] * gy + Rt[1, 2] * gz
            grz = Rt[2, 0] * gx + Rt[2, 1] * gy + Rt[2, 2] * gz

            V = S * cy * cx
            grad_rot = jnp.stack([grx.reshape(V), gry.reshape(V),
                                  grz.reshape(V)], -1)
            face, bary, ok = icos_hist_bin(grad_rot)
            mag = jnp.sqrt(jnp.sum(grad_rot * grad_rot, -1))
            total = (mask & inside).reshape(V) & ok
            G = vertex_weights(face, bary)
            G = G * (mag * total.astype(jnp.float32))[:, None]

            def axis_w(vb):
                flo = jnp.floor(vb)
                fr = (vb - flo).reshape(V)
                flo = flo.reshape(V).astype(jnp.int32)
                b = jnp.arange(NHIST_PER_DIM, dtype=jnp.int32)
                return ((flo[:, None] == b[None, :]) * (1.0 - fr[:, None]) +
                        ((flo[:, None] + 1) == b[None, :]) * fr[:, None]
                        ).astype(jnp.float32)
            wx = axis_w(vbx); wy = axis_w(vby); wz = axis_w(vbz)
            Sw = (wz[:, :, None, None] * wy[:, None, :, None] *
                  wx[:, None, None, :]).reshape(V, DESC_NUM_TOTAL_HIST)
            hist = jnp.einsum("vh,vb->hb", Sw, G,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            return hist.reshape(DESC_NUMEL)

        raw = jax.vmap(jax.vmap(one, in_axes=(None, 0, 0)))(
            block_ext, centers_l, R_l)
        return jax.lax.psum(raw, axis_name)

    raw = shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis_name, axis_name, None, None),
                  P(batch_axis_name), P(batch_axis_name)),
        out_specs=P(batch_axis_name),
        check_vma=False,
    )(level, centers_zyx.astype(jnp.float32), Rmat.astype(jnp.float32))
    return jax.vmap(postprocess)(raw)
