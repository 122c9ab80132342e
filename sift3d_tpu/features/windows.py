"""Clamped sphere-window gathers shared by orientation and descriptors.

Every keypoint of a pyramid level shares the same window radius, so the
reference's per-keypoint sphere loops (IM_LOOP_SPHERE_START, sift.c:96-119)
become batched dynamic-slice gathers of a fixed-size box. The box size is
clamped to the level extent: a voxel can only contribute if it lies in
[1, n-2], so the gather core never needs to exceed n-2 voxels per dimension,
which keeps small pyramid levels cheap even when the nominal window radius
is larger than the level itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def window_gradients(win: jax.Array, units):
    """Unit-corrected central differences over a gathered window's core:
    0.5 * (I[+1] - I[-1]) / u per axis (IM_GET_GRAD_ISO, reference
    immacros.h:150-155). ``win`` is a core-plus-1-halo (cz+2, cy+2, cx+2)
    window (z, y, x order); returns (gx, gy, gz) over the core."""
    inv = [np.float32(1.0) / np.float32(u) for u in units]  # (ux, uy, uz)
    gx = jnp.float32(0.5) * (win[1:-1, 1:-1, 2:] -
                             win[1:-1, 1:-1, :-2]) * inv[0]
    gy = jnp.float32(0.5) * (win[1:-1, 2:, 1:-1] -
                             win[1:-1, :-2, 1:-1]) * inv[1]
    gz = jnp.float32(0.5) * (win[2:, 1:-1, 1:-1] -
                             win[:-2, 1:-1, 1:-1]) * inv[2]
    return gx, gy, gz


def window_extent(R: int, n: int, center_integral: bool) -> int:
    """Core extent (excluding the +-1 gradient halo) along one axis."""
    span = 2 * R + 1 if center_integral else 2 * R + 2
    return max(min(span, n - 2), 1)


def window_start(base: jax.Array, R: int, core: int, n: int) -> jax.Array:
    """Clamped start of the core window for keypoint floor-coordinate base."""
    return jnp.clip(base - R, 1, n - 1 - core)


def gather_window(level: jax.Array, base_zyx, radii, cores):
    """Gather the core window plus a 1-voxel gradient halo.

    Args:
      level: (nz, ny, nx).
      base_zyx: three int32 scalars (floor of center coords, z/y/x order).
      radii: (Rz, Ry, Rx) ints.
      cores: (core_z, core_y, core_x) ints from window_extent.

    Returns:
      win: (core_z+2, core_y+2, core_x+2) window.
      starts: (sz, sy, sx) core start coords in the level.
    """
    nz, ny, nx = level.shape
    Rz, Ry, Rx = radii
    cz, cy, cx = cores
    sz = window_start(base_zyx[0], Rz, cz, nz)
    sy = window_start(base_zyx[1], Ry, cy, ny)
    sx = window_start(base_zyx[2], Rx, cx, nx)
    win = jax.lax.dynamic_slice(
        level, (sz - 1, sy - 1, sx - 1), (cz + 2, cy + 2, cx + 2))
    return win, (sz, sy, sx)
