"""Image warping and resampling.

Reproduces im_inv_transform / resample_linear / resample_lanczos2 /
im_resample (reference imutil/imutil.c:2040-2244):

- pull-warp: for every output voxel (x, y, z), apply the affine to get a
  source coordinate and sample the source image there;
- trilinear sampling uses floor/ceil corners and returns 0 outside
  [0, n-1] in any dimension (imutil.c:2085-2124);
- Lanczos-2 sampling evaluates the unnormalized kernel over the window
  [floor(p)-2, floor(p)+2] clamped to the volume (out-of-range taps are
  skipped, not clamped), with DBL_EPSILON added to |dx| before the kernel
  (imutil.c:2127-2180);
- im_resample maps to new physical units via the diagonal affine
  diag(units_new / units_old) with output dims ceil(n * old / new)
  (imutil.c:2191-2244).

All samplers are batched over the full output grid - XLA fuses the gather
and weighting into one pass.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import f64

_DBL_EPSILON = 2.220446049250313e-16


def apply_affine_grid(A: jax.Array, shape_zyx: tuple[int, int, int]):
    """Transformed coordinates for every voxel of an output grid.

    Returns (xs, ys, zs), each (nz, ny, nx) f64: A @ [x; y; z; 1].
    """
    nz, ny, nx = shape_zyx
    A = A.astype(f64())
    x = jnp.arange(nx, dtype=f64())[None, None, :]
    y = jnp.arange(ny, dtype=f64())[None, :, None]
    z = jnp.arange(nz, dtype=f64())[:, None, None]
    xs = A[0, 0] * x + A[0, 1] * y + A[0, 2] * z + A[0, 3]
    ys = A[1, 0] * x + A[1, 1] * y + A[1, 2] * z + A[1, 3]
    zs = A[2, 0] * x + A[2, 1] * y + A[2, 2] * z + A[2, 3]
    return xs, ys, zs


def sample_linear(src: jax.Array, xs, ys, zs) -> jax.Array:
    """Trilinear sampling with out-of-bounds -> 0 (imutil.c:2085-2124)."""
    nz, ny, nx = src.shape
    inb = ((xs >= 0) & (xs <= nx - 1) & (ys >= 0) & (ys <= ny - 1) &
           (zs >= 0) & (zs <= nz - 1))
    xs = jnp.where(inb, xs, 0.0)
    ys = jnp.where(inb, ys, 0.0)
    zs = jnp.where(inb, zs, 0.0)

    fx = jnp.floor(xs); fy = jnp.floor(ys); fz = jnp.floor(zs)
    cx = jnp.ceil(xs); cy = jnp.ceil(ys); cz = jnp.ceil(zs)
    dx = xs - fx; dy = ys - fy; dz = zs - fz
    fx = fx.astype(jnp.int32); fy = fy.astype(jnp.int32)
    fz = fz.astype(jnp.int32)
    cx = cx.astype(jnp.int32); cy = cy.astype(jnp.int32)
    cz = cz.astype(jnp.int32)

    def at(zz, yy, xx):
        return src[zz, yy, xx].astype(f64())

    out = (at(fz, fy, fx) * (1 - dx) * (1 - dy) * (1 - dz)
           + at(fz, cy, fx) * (1 - dx) * dy * (1 - dz)
           + at(fz, fy, cx) * dx * (1 - dy) * (1 - dz)
           + at(fz, cy, cx) * dx * dy * (1 - dz)
           + at(cz, fy, fx) * (1 - dx) * (1 - dy) * dz
           + at(cz, cy, fx) * (1 - dx) * dy * dz
           + at(cz, fy, cx) * dx * (1 - dy) * dz
           + at(cz, cy, cx) * dx * dy * dz)
    return jnp.where(inb, out, 0.0).astype(src.dtype)


def _lanczos(x, a: float):
    """Unnormalized Lanczos kernel (imutil.c:2183-2187); x > 0."""
    pi_x = jnp.pi * x
    return a * jnp.sin(pi_x) * jnp.sin(pi_x / a) / (pi_x * pi_x)


def sample_lanczos2(src: jax.Array, xs, ys, zs) -> jax.Array:
    """Lanczos-2 sampling with out-of-bounds -> 0 (imutil.c:2127-2180)."""
    a = 2
    nz, ny, nx = src.shape
    inb = ((xs >= 0) & (xs <= nx - 1) & (ys >= 0) & (ys <= ny - 1) &
           (zs >= 0) & (zs <= nz - 1))
    xs_s = jnp.where(inb, xs, 0.0)
    ys_s = jnp.where(inb, ys, 0.0)
    zs_s = jnp.where(inb, zs, 0.0)
    fx = jnp.floor(xs_s).astype(jnp.int32)
    fy = jnp.floor(ys_s).astype(jnp.int32)
    fz = jnp.floor(zs_s).astype(jnp.int32)

    out = jnp.zeros(xs.shape, f64())
    offs = list(range(-a, a + 1))

    def axis_taps(f, p, n):
        """Per-offset (index, kernel weight, in-window mask) along one axis."""
        idxs, ws, ms = [], [], []
        for o in offs:
            i = f + o
            m = (i >= 0) & (i <= n - 1)
            ic = jnp.clip(i, 0, n - 1)
            w = _lanczos(jnp.abs(ic.astype(f64()) - p) + _DBL_EPSILON, a)
            idxs.append(ic); ws.append(jnp.where(m, w, 0.0)); ms.append(m)
        return idxs, ws

    xi, xw = axis_taps(fx, xs_s, nx)
    yi, yw = axis_taps(fy, ys_s, ny)
    zi, zw = axis_taps(fz, zs_s, nz)
    for iz in range(len(offs)):
        for iy in range(len(offs)):
            wzy = zw[iz] * yw[iy]
            for ix in range(len(offs)):
                out = out + wzy * xw[ix] * \
                    src[zi[iz], yi[iy], xi[ix]].astype(f64())
    return jnp.where(inb, out, 0.0).astype(src.dtype)


_SAMPLERS = {"linear": sample_linear, "lanczos2": sample_lanczos2}


def im_inv_transform(A: jax.Array, src: jax.Array,
                     out_shape_zyx: tuple[int, int, int] | None = None,
                     interp: str = "linear") -> jax.Array:
    """Pull-warp ``src`` through affine ``A`` (im_inv_transform,
    imutil.c:2040-2081). ``A`` maps output (x,y,z) to source coordinates."""
    if out_shape_zyx is None:
        out_shape_zyx = src.shape
    xs, ys, zs = apply_affine_grid(A, tuple(out_shape_zyx))
    return _SAMPLERS[interp](src, xs, ys, zs)


def resample_dims(dims_zyx, units_old, units_new):
    """Output dims for im_resample: ceil(n * old_unit / new_unit) per axis.

    dims are (nz, ny, nx); units are (ux, uy, uz) - note reversed order.
    """
    nz, ny, nx = dims_zyx
    fx = units_old[0] / units_new[0]
    fy = units_old[1] / units_new[1]
    fz = units_old[2] / units_new[2]
    return (int(math.ceil(nz * fz)), int(math.ceil(ny * fy)),
            int(math.ceil(nx * fx)))


def im_resample(src: jax.Array, units_old, units_new,
                interp: str = "linear") -> jax.Array:
    """Resample to new physical units (im_resample, imutil.c:2191-2244)."""
    out_shape = resample_dims(src.shape, units_old, units_new)
    A = jnp.asarray(np.array([
        [units_new[0] / units_old[0], 0, 0, 0],
        [0, units_new[1] / units_old[1], 0, 0],
        [0, 0, units_new[2] / units_old[2], 0]], dtype=np.float64))
    return im_inv_transform(A, src, out_shape, interp)
