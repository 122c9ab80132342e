"""Spatially-sharded windowed feature stages (SURVEY §5.7 back half).

Orientation windows (radius 3*1.5*sd mm) and descriptor windows (radius
2*7.07*sd mm) span most of a volume at octave 0, so the halo-replication
strategy used for convolution (shard_conv) degenerates: the halo would be
wider than the shard. The TPU-native decomposition is different: both
stages are *sums over window voxels* - the 3x3 structure tensor / window
gradient (assign_eig_ori, reference sift3d/sift.c:1354-1514) and the
64x12 descriptor histogram (extract_descrip, sift.c:1834-1928) - so each
shard accumulates the partial sum over its own rows of the sharded
spatial axis (plus a 1-voxel ppermute gradient halo) and the partials
meet in a tiny `psum` over the "space" axis: (K, 6)+(K, 3) for
orientation, (K, 768) for descriptors. No window voxel is ever
replicated across shards; keypoints (a few dozen scalars each) are
replicated instead of exchanged.

Any spatial axis can be sharded (``shard_dim`` "z"/"y"/"x", like
shard_conv): the per-voxel terms depend only on *global* coordinate
grids, so the sharded axis contributes its local rows and the other two
axes a dynamically-sliced window core - no transposes, no basis
permutation. x/y sharding matters for thin-z geometries such as the
y-z-plane mammogram layouts the reference supports
(/root/reference/imutil/dicom.cpp:494-515).

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

_DIMS = {"z": 0, "y": 1, "x": 2}


def _space_spec(batch_axis_name: str, axis_name: str, sd: int):
    """PartitionSpec for a (B, nz, ny, nx) array sharded on spatial
    dim ``sd`` (0=z, 1=y, 2=x)."""
    spec = [batch_axis_name, None, None, None]
    spec[1 + sd] = axis_name
    return P(*spec)


def _shard_window(ext_v, starts, sizes, sd, S):
    """Slice the per-keypoint window from the halo-extended local block:
    all local rows (+halo) on the sharded axis, a dynamic core +1-voxel
    gradient margin on the other two."""
    sl_starts, sl_sizes = [], []
    anchor = starts[(sd + 1) % 3]      # any dynamic start, for dtype
    for d in range(3):
        if d == sd:
            sl_starts.append(jnp.zeros((), anchor.dtype))
            sl_sizes.append(S + 2)
        else:
            sl_starts.append(starts[d] - 1)
            sl_sizes.append(sizes[d] + 2)
    return jax.lax.dynamic_slice(ext_v, tuple(sl_starts), tuple(sl_sizes))


def _grids(starts, sizes, sd, S, a0):
    """Global-coordinate grids (one per axis, broadcastable to the window
    core): the sharded axis enumerates its local rows at global offset
    ``a0``, the others their dynamic window cores."""
    grids = []
    for d in range(3):
        if d == sd:
            g = a0 + jnp.arange(S, dtype=jnp.int32)
        else:
            g = starts[d] + jnp.arange(sizes[d], dtype=jnp.int32)
        shape = [1, 1, 1]
        shape[d] = g.shape[0]
        grids.append(g.reshape(shape))
    return grids


def orient_level_sharded(level: jax.Array, zyx: jax.Array, sd_scale: float,
                         units, corner_thresh: float, mesh: Mesh,
                         axis_name: str = "space",
                         batch_axis_name: str = "data",
                         shard_dim: str = "z"):
    """Orientations for one level's keypoints, windows partitioned over
    the ``shard_dim`` spatial axis.

    Args:
      level: (B, nz, ny, nx) batched level, ``shard_dim`` sharded over
        ``axis_name``.
      zyx: (B, K, 3) int32 keypoint voxel coords (replicated over space).
    Returns (R (B, K, 3, 3) f32, valid (B, K) bool), space-replicated.
    """
    from ..config import ORI_RAD_FCTR, ORI_SIG_FCTR

    B, nz, ny, nx = level.shape
    sd = _DIMS[shard_dim]
    n3 = (nz, ny, nx)
    sigma = ORI_SIG_FCTR * sd_scale
    rad = sigma * ORI_RAD_FCTR
    Rx, Ry, Rz = window_radii(rad, units)
    R3 = (Rz, Ry, Rx)
    c3 = tuple(window_extent(R3[d], n3[d], True) for d in range(3))
    ux, uy, uz = (np.float32(u) for u in units)
    u3 = (uz, uy, ux)
    n_sh = mesh.shape[axis_name]
    S = n3[sd] // n_sh
    assert S * n_sh == n3[sd], (n3[sd], n_sh)

    def local(block, zyx_l):
        a0 = jax.lax.axis_index(axis_name) * S
        block_ext = shard_halo(block, 1, axis_name, z_axis=1 + sd)

        def one(ext_v, row):
            starts = [window_start(row[d], R3[d], c3[d], n3[d])
                      for d in range(3)]
            win = _shard_window(ext_v, starts, c3, sd, S)
            zg, yg, xg = _grids(starts, c3, sd, S, a0)
            owned = (([zg, yg, xg][sd] >= starts[sd]) &
                     ([zg, yg, xg][sd] < starts[sd] + c3[sd]))
            in_box = ((xg >= row[2] - Rx) & (xg <= row[2] + Rx) &
                      (yg >= row[1] - Ry) & (yg <= row[1] + Ry) &
                      (zg >= row[0] - Rz) & (zg <= row[0] + Rz))
            ddx = (xg - row[2]).astype(jnp.float32) * ux
            ddy = (yg - row[1]).astype(jnp.float32) * uy
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
        in_specs=(_space_spec(batch_axis_name, axis_name, sd),
                  P(batch_axis_name)),
        out_specs=(P(batch_axis_name), P(batch_axis_name)),
        check_vma=False,
    )(level, zyx)
    R, valid = jax.vmap(
        lambda a, v: orientations_from_tensor(a, v, corner_thresh))(A6, vd)
    return R, valid


def orient_level_z_sharded(level, zyx, sd, units, corner_thresh, mesh,
                           axis_name: str = "space",
                           batch_axis_name: str = "data"):
    """Back-compat alias: z-sharded orientation windows."""
    return orient_level_sharded(level, zyx, sd, units, corner_thresh,
                                mesh, axis_name, batch_axis_name, "z")


def descrip_level_sharded(level: jax.Array, centers_zyx: jax.Array,
                          Rmat: jax.Array, sd_scale: float, units,
                          mesh: Mesh, axis_name: str = "space",
                          batch_axis_name: str = "data",
                          shard_dim: str = "z") -> jax.Array:
    """Descriptors for one level's keypoints, windows partitioned over
    the ``shard_dim`` spatial axis.

    Args:
      level: (B, nz, ny, nx) batched level, ``shard_dim`` sharded over
        ``axis_name``.
      centers_zyx: (B, K, 3) f32 fractional centers; Rmat: (B, K, 3, 3).
    Returns (B, K, 768) f32 postprocessed descriptors, space-replicated.
    """
    B, nz, ny, nx = level.shape
    sd = _DIMS[shard_dim]
    n3 = (nz, ny, nx)
    sigma = np.float32(sd_scale) * np.float32(DESC_SIG_FCTR)
    rad = np.float32(DESC_RAD_FCTR) * sigma
    R3 = tuple(int(math.ceil(float(rad) / units[2 - d])) for d in range(3))
    c3 = tuple(window_extent(R3[d], n3[d], False) for d in range(3))
    ux, uy, uz = (np.float32(u) for u in units)
    n_sh = mesh.shape[axis_name]
    S = n3[sd] // n_sh
    assert S * n_sh == n3[sd], (n3[sd], n_sh)

    def local(block, centers_l, R_l):
        a0 = jax.lax.axis_index(axis_name) * S
        block_ext = shard_halo(block, 1, axis_name, z_axis=1 + sd)

        def one(ext_v, c, Rk):
            czf, cyf, cxf = c[0], c[1], c[2]
            base = [jnp.floor(c[d]).astype(jnp.int32) for d in range(3)]
            starts = [window_start(base[d], R3[d], c3[d], n3[d])
                      for d in range(3)]
            win = _shard_window(ext_v, starts, c3, sd, S)
            zg, yg, xg = _grids(starts, c3, sd, S, a0)
            owned = (([zg, yg, xg][sd] >= starts[sd]) &
                     ([zg, yg, xg][sd] < starts[sd] + c3[sd]))

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

            V = int(np.prod([S if d == sd else c3[d] for d in range(3)]))
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
        in_specs=(_space_spec(batch_axis_name, axis_name, sd),
                  P(batch_axis_name), P(batch_axis_name)),
        out_specs=P(batch_axis_name),
        check_vma=False,
    )(level, centers_zyx.astype(jnp.float32), Rmat.astype(jnp.float32))
    return jax.vmap(postprocess)(raw)


def descrip_level_z_sharded(level, centers_zyx, Rmat, sd, units, mesh,
                            axis_name: str = "space",
                            batch_axis_name: str = "data") -> jax.Array:
    """Back-compat alias: z-sharded descriptor windows."""
    return descrip_level_sharded(level, centers_zyx, Rmat, sd, units,
                                 mesh, axis_name, batch_axis_name, "z")
