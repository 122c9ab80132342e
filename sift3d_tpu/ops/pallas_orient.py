"""Pallas window kernel for orientation structure tensors.

The XLA orientation path (features/orientation.py:_window_terms) gathers
one clamped window per keypoint and reduces nine masked sums from it
(six structure-tensor entries + the 3-vector window gradient,
assign_eig_ori, reference sift3d/sift.c:1354-1514). Like the descriptor
path before it (ops/pallas_window.py), those per-window reductions lower
to layout relayouts under XLA that dominate the stage; this kernel keeps
everything in native (sublane, lane) layout:

- windows are gathered by XLA into a stacked (K, wz+2, wy+2, wx+2)
  tensor (a plain dynamic-slice map) and pipelined into VMEM one
  keypoint per grid step;
- per z-plane, the unit-corrected gradients, sphere/box mask and
  Gaussian weight are computed as (cy, cx) 2D arrays on the VPU and the
  nine weighted products are accumulated into a (16, cy_p, cx_p) VMEM
  scratch (rows: w*gx*gx, w*gx*gy, w*gx*gz, w*gy*gy, w*gy*gz, w*gz*gz,
  w*gx, w*gy, w*gz, then zero padding);
- one final lane/sublane reduction collapses the scratch to the (16,)
  output row, so no scalar ever round-trips through a relayout.

Accumulation is float32 (the XLA path's f64 accumulators also run as
f32 on the benchmark configuration; the golden keypoint row-exactness
at 256^3 was established under f32 sums). Output rows 9..15 are zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _orient_kernel_body(act_ref, info_ref, win_ref, out_ref, acc,
                        *, cores, units, sigma, rad):
    """One keypoint per grid step; see module docstring."""
    ckz, cky, ckx = cores
    ux, uy, uz = (np.float32(u) for u in units)
    inv_ux = np.float32(1.0) / ux
    inv_uy = np.float32(1.0) / uy
    inv_uz = np.float32(1.0) / uz
    rad32 = np.float32(rad)
    sig32 = np.float32(sigma)

    cky_p = -(-cky // 8) * 8
    ckx_p = -(-ckx // 128) * 128

    k = pl.program_id(0)

    @pl.when(act_ref[k] > 0)
    def _():
        acc[...] = jnp.zeros((16, cky_p, ckx_p), jnp.float32)

        # info column k: [sz, sy, sx, cz, cy, cx, Rz, Ry, Rx] (floats;
        # starts/centers/radii are small integers, exactly representable).
        sz = info_ref[0, k]
        sy = info_ref[1, k]
        sx = info_ref[2, k]
        cz_f = info_ref[3, k]
        cy_f = info_ref[4, k]
        cx_f = info_ref[5, k]
        rz_f = info_ref[6, k]
        ry_f = info_ref[7, k]
        rx_f = info_ref[8, k]

        x_io = jax.lax.broadcasted_iota(
            jnp.int32, (cky, ckx), 1).astype(jnp.float32)
        y_io = jax.lax.broadcasted_iota(
            jnp.int32, (cky, ckx), 0).astype(jnp.float32)
        dx = x_io + (sx - cx_f)            # voxel offset from center
        dy = y_io + (sy - cy_f)
        vx = dx * ux
        vy = dy * uy
        sq_xy = vx * vx + vy * vy
        in_xy = (jnp.abs(dx) <= rx_f) & (jnp.abs(dy) <= ry_f)

        def z_body(z, carry):
            dz = z.astype(jnp.float32) + (sz - cz_f)
            vz = dz * uz
            sq = sq_xy + vz * vz
            msk = (in_xy & (jnp.abs(dz) <= rz_f) &
                   (sq <= rad32 * rad32)).astype(jnp.float32)
            w = jnp.exp(jnp.float32(-0.5) * sq / (sig32 * sig32)) * msk

            gx = jnp.float32(0.5) * (win_ref[0, z + 1, 1:1 + cky, 2:2 + ckx] -
                                     win_ref[0, z + 1, 1:1 + cky, 0:ckx]) \
                * inv_ux
            gy = jnp.float32(0.5) * (win_ref[0, z + 1, 2:2 + cky, 1:1 + ckx] -
                                     win_ref[0, z + 1, 0:cky, 1:1 + ckx]) \
                * inv_uy
            gz = jnp.float32(0.5) * (win_ref[0, z + 2, 1:1 + cky, 1:1 + ckx] -
                                     win_ref[0, z, 1:1 + cky, 1:1 + ckx]) \
                * inv_uz

            wgx = w * gx
            wgy = w * gy
            wgz = w * gz
            rows = (wgx * gx, wgx * gy, wgx * gz,
                    wgy * gy, wgy * gz, wgz * gz,
                    wgx, wgy, wgz)
            for i, q in enumerate(rows):
                acc[i, :cky, :ckx] = acc[i, :cky, :ckx] + q
            return carry

        jax.lax.fori_loop(0, ckz, z_body, jnp.int32(0))
        # Final reduction as ONE (1, V) x (V, 16) MXU contraction so the
        # output stays a 2D (1, 16) block (Mosaic rejects 1D stores).
        V = cky_p * ckx_p
        ones = jnp.ones((1, V), jnp.float32)
        out_ref[0] = jax.lax.dot_general(
            ones, acc.reshape(16, V)[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(act_ref[k] == 0)
    def _():
        out_ref[0] = jnp.zeros((1, 16), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cores", "units", "sigma",
                                             "rad", "interpret"))
def _orient_pallas_call(wins, active, info, *, cores, units, sigma, rad,
                        interpret=False):
    K = wins.shape[0]
    ckz, cky, ckx = cores
    kernel = functools.partial(_orient_kernel_body, cores=cores,
                               units=units, sigma=sigma, rad=rad)
    out = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ckz + 2, cky + 2, ckx + 2),
                         lambda k: (k, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 16), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((16, -(-cky // 8) * 8, -(-ckx // 128) * 128),
                       jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((K, 1, 16), jnp.float32),
        interpret=interpret,
    )(active, info, wins)
    return out.reshape(K, 16)


def orient_vmem_ok(cores) -> bool:
    """Whether the window block + accumulation scratch fit VMEM."""
    ckz, cky, ckx = cores
    x_pad = -(-ckx // 128) * 128
    win = (ckz + 2) * (cky + 2) * (-(-(ckx + 2) // 128) * 128) * 4
    scratch = 16 * (-(-cky // 8) * 8) * x_pad * 4
    return win + scratch < 12 * 1024 * 1024


def _window_starts(shape, zyx, radii, cores):
    nz, ny, nx = shape
    Rz, Ry, Rx = radii
    ckz, cky, ckx = cores
    return (jnp.clip(zyx[:, 0] - Rz, 1, nz - 1 - ckz),
            jnp.clip(zyx[:, 1] - Ry, 1, ny - 1 - cky),
            jnp.clip(zyx[:, 2] - Rx, 1, nx - 1 - ckx))


def _info_rows(sz, sy, sx, zyx, radii):
    starts_f = jnp.stack([sz, sy, sx], -1).astype(jnp.float32)
    rads = jnp.broadcast_to(
        jnp.asarray(radii, jnp.float32), (zyx.shape[0], 3))
    return jnp.concatenate(
        [starts_f, zyx.astype(jnp.float32), rads], axis=-1).T   # (9, K)


@functools.lru_cache(maxsize=512)
def _orient_terms_fn(radii, cores, units, sigma, rad, interpret):
    """custom_vmap-wrapped structure-tensor terms for one static level
    geometry; batching flattens (B, K) rows into the kernel grid (same
    design as pallas_window._raw_descrip_fn)."""
    ckz, cky, ckx = cores

    @jax.custom_batching.custom_vmap
    def terms(level, zyx, active):
        sz, sy, sx = _window_starts(level.shape, zyx, radii, cores)

        def gather(args):
            z0, y0, x0 = args
            return jax.lax.dynamic_slice(
                level, (z0 - 1, y0 - 1, x0 - 1),
                (ckz + 2, cky + 2, ckx + 2))
        wins = jax.lax.map(gather, (sz, sy, sx))
        info = _info_rows(sz, sy, sx, zyx, radii)
        out = _orient_pallas_call(
            wins, active.astype(jnp.int32), info, cores=cores,
            units=units, sigma=sigma, rad=rad, interpret=interpret)
        return out[:, :6], out[:, 6:9]

    @terms.def_vmap
    def terms_vmap(axis_size, in_batched, level, zyx, active):
        B = axis_size
        lb, cb, ab = in_batched

        def bc(x, batched):
            return x if batched else jnp.broadcast_to(x, (B,) + x.shape)
        level = bc(level, lb)
        zyx = bc(zyx, cb)
        active = bc(active, ab)
        K = zyx.shape[1]
        shape3 = level.shape[1:]
        z2 = zyx.reshape(B * K, 3)
        sz, sy, sx = _window_starts(shape3, z2, radii, cores)
        vol_idx = (jnp.arange(B * K, dtype=jnp.int32) // K)

        def gather(args):
            b, z0, y0, x0 = args
            return jax.lax.dynamic_slice(
                level, (b, z0 - 1, y0 - 1, x0 - 1),
                (1, ckz + 2, cky + 2, ckx + 2))[0]
        wins = jax.lax.map(gather, (vol_idx, sz, sy, sx))
        info = _info_rows(sz, sy, sx, z2, radii)
        out = _orient_pallas_call(
            wins, active.reshape(B * K).astype(jnp.int32), info,
            cores=cores, units=units, sigma=sigma, rad=rad,
            interpret=interpret)
        out = out.reshape(B, K, 16)
        return (out[:, :, :6], out[:, :, 6:9]), (True, True)
    return terms


def orient_terms_pallas(level: jax.Array, zyx: jax.Array, count,
                        radii, cores, units, sigma: float, rad: float,
                        interpret: bool = False):
    """Structure-tensor terms for one level bucket.

    Args:
      level: (nz, ny, nx) f32 gaussian pyramid level.
      zyx: (K, 3) int32 keypoint voxel coords.
      count: () i32 number of real rows; rows >= count return zeros.
      radii: (Rz, Ry, Rx) voxel half-extents of the sphere bounding box.
      cores: (cz, cy, cx) clamped core extents (features.windows).
      units: (ux, uy, uz); sigma/rad in mm.

    Returns (A6 (K, 6) f32 upper-triangle sums, vd (K, 3) f32 window
    gradients). vmaps over a leading batch axis by flattening rows into
    the kernel grid.
    """
    K = zyx.shape[0]
    active = (jnp.arange(K, dtype=jnp.int32) <
              jnp.asarray(count, jnp.int32)).astype(jnp.int32)
    fn = _orient_terms_fn(
        tuple(int(r) for r in radii), tuple(int(c) for c in cores),
        (float(units[0]), float(units[1]), float(units[2])),
        float(sigma), float(rad), bool(interpret))
    return fn(level, zyx.astype(jnp.int32), active)
