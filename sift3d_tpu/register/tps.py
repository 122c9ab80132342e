"""Thin-plate spline (TPS) transforms.

The reference declares a Tps transform with an implemented *apply*
(apply_Tps_xyz, imutil.c:2676-2729; apply_Tps_Mat_rm, imutil.c:2743-2805;
kernel U(r^2) = r^2 log(r^2)) but never implemented the fitting
(solve_system: "TPS not yet implemented", imutil.c:4507). This module
reproduces the apply exactly and additionally implements the standard TPS
fit, completing the capability:

    [ K   P ] [ w ]   [ v ]        K_ij = U(|c_i - c_j|^2)
    [ P^T 0 ] [ a ] = [ 0 ],       P    = [1 | c]

with optional bending-energy regularization lambda on K's diagonal.
Parameters are stored exactly like the reference Tps struct
(imtypes.h:368-373): params (3, n_ctrl + 4) with columns
[w_0..w_{n-1}, a_const, a_x, a_y, a_z], control points (n_ctrl, 3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..dtypes import f64


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Tps:
    params: jax.Array    # (3, n_ctrl + 4)
    ctrl: jax.Array      # (n_ctrl, 3) control points (reference kp_src)


def _u(r_sq: jax.Array) -> jax.Array:
    """U(r^2) = r^2 log(r^2), U(0) = 0 (imutil.c:2700-2705)."""
    safe = jnp.where(r_sq > 0, r_sq, 1.0)
    return jnp.where(r_sq > 0, r_sq * jnp.log(safe), 0.0)


def tps_apply(tps: Tps, pts: jax.Array) -> jax.Array:
    """Apply to (..., 3) points (apply_Tps_xyz semantics)."""
    pts = pts.astype(f64())
    ctrl = tps.ctrl.astype(f64())
    d = pts[..., None, :] - ctrl                    # (..., n, 3)
    U = _u(jnp.sum(d * d, axis=-1))                 # (..., n)
    n = ctrl.shape[0]
    w = tps.params[:, :n].astype(f64())             # (3, n)
    a = tps.params[:, n:].astype(f64())             # (3, 4)
    hi = jax.lax.Precision.HIGHEST      # TPU default truncates f32 to bf16
    affine = a[:, 0] + jnp.matmul(pts, a[:, 1:].T, precision=hi)  # (..., 3)
    return jnp.matmul(U, w.T, precision=hi) + affine


def fit_tps(ctrl: jax.Array, targets: jax.Array,
            reg: float = 0.0) -> Tps:
    """Fit a TPS interpolating ctrl -> targets ((n, 3) each).

    reg > 0 relaxes exact interpolation toward smoothness (standard
    bending-energy regularization). New capability - the reference's
    solve_system never implemented TPS (imutil.c:4504-4508).
    """
    ctrl = jnp.asarray(ctrl, f64())
    targets = jnp.asarray(targets, f64())
    n = ctrl.shape[0]
    d = ctrl[:, None, :] - ctrl[None, :, :]
    K = _u(jnp.sum(d * d, axis=-1)) + reg * jnp.eye(n, dtype=f64())
    P = jnp.concatenate([jnp.ones((n, 1), f64()), ctrl], axis=1)  # (n, 4)
    top = jnp.concatenate([K, P], axis=1)
    bot = jnp.concatenate([P.T, jnp.zeros((4, 4), f64())], axis=1)
    L = jnp.concatenate([top, bot], axis=0)         # (n+4, n+4)
    rhs = jnp.concatenate([targets, jnp.zeros((4, 3), f64())], axis=0)
    sol = jnp.linalg.solve(L, rhs)                  # (n+4, 3)
    return Tps(params=sol.T, ctrl=ctrl)


def im_inv_transform_tps(tps: Tps, src: jax.Array,
                         out_shape_zyx=None,
                         interp: str = "linear",
                         src_units=(1.0, 1.0, 1.0),
                         ref_units=(1.0, 1.0, 1.0)) -> jax.Array:
    """Pull-warp through a TPS (im_inv_transform with a Tps tform).

    The TPS maps ref mm coordinates to src mm coordinates (the space
    register_pair_tps fits in); the output grid is the ref voxel grid
    scaled by ``ref_units`` and samples are taken at the result divided
    by ``src_units``. With unit spacings this is a pure voxel warp.
    """
    from ..ops.interp import _SAMPLERS
    if out_shape_zyx is None:
        out_shape_zyx = src.shape
    nz, ny, nx = out_shape_zyx
    ru = jnp.asarray(ref_units, f64())
    su = jnp.asarray(src_units, f64())
    x = jnp.arange(nx, dtype=f64())
    y = jnp.arange(ny, dtype=f64())
    z = jnp.arange(nz, dtype=f64())
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    pts = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3) * ru[None, :]
    # Chunk the grid: tps_apply materializes an (n_pts, n_ctrl, 3) f64
    # displacement intermediate, which at 256^3+ x dozens of control
    # points is tens of GB if applied to the whole grid at once.
    n_ctrl = int(tps.ctrl.shape[0])
    chunk = max(1, (1 << 24) // max(n_ctrl, 1))
    outs = [tps_apply(tps, pts[i:i + chunk]) / su[None, :]
            for i in range(0, pts.shape[0], chunk)]
    out = jnp.concatenate(outs, axis=0).reshape(nz, ny, nx, 3)
    return _SAMPLERS[interp](src, out[..., 0], out[..., 1], out[..., 2])
