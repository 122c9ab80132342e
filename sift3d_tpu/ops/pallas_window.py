"""Pallas window kernel for descriptor extraction.

The XLA descriptor path (features/descriptor.py) computes per-voxel
quantities on gathered 3D windows and flattens them to (V,) vectors for
the histogram einsum; XLA lowers those reshapes to layout relayouts that
dominate the single-volume steady state (~65 ms/volume at 128^3, vs ~5 ms
of real dense compute). This kernel keeps the whole computation in native
(sublane, lane) layout so no relayout ever materializes:

- the clamped per-keypoint windows are gathered by XLA into a stacked
  (K, wz, wy, wx) tensor (a plain dynamic-slice map - cheap and
  relayout-free); the Pallas grid runs one keypoint per step with the
  window block pipelined into VMEM by the standard BlockSpec machinery;
- rows >= count (bucket padding) skip all compute via a scalar count in
  SMEM (replacing the reference's per-keypoint OpenMP loop,
  sift.c:2229-2240, whose work scales with the true keypoint count);
- per z-plane, all per-voxel quantities (rotated displacements, Gaussian
  weights, unit-corrected gradients, icosahedral face via argmax over the
  20 outward normals, barycentrics via per-face closed-form solves - the
  same gather-free formulation as ops/geometry.py) are computed as
  (cy, cx) 2D arrays on the VPU;
- the trilinear x barycentric histogram accumulation
  (SIFT3D_desc_acc_interp, sift.c:1687-1791) becomes, per z-plane, a
  factored one-hot build of full-plane W (16, cy, cx) = wz (x) wy and
  T (48, cy, cx) = wx (x) G scratch tensors followed by ONE
  double-contraction MXU matmul (contracting both window dims at once)
  into a running (16, 48) accumulator - the (64, 12) histogram laid out
  as [hz*4+hy, hx*12+bin], unpacked by a tiny reshape outside the
  kernel. (Round 5: this replaced a per-window-ROW loop of (16, cx) x
  (48, cx) micro-matmuls - 9.4M sequential ~160 ns iterations for a
  4096-keypoint bucket, 87% of config 4's descriptor stage; the
  per-plane contraction removes the row loop entirely.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BARY_EPS, NHIST_PER_DIM
from .geometry import face_solve_tables, face_tables

def _descrip_kernel_body(act_ref, info_ref, win_ref, out_ref, wplane,
                         tplane, *, cores, units, sigma, rad):
    """One keypoint per grid step; see module docstring."""
    ckz, cky, ckx = cores
    ux, uy, uz = (np.float32(u) for u in units)
    inv_ux = np.float32(1.0) / ux
    inv_uy = np.float32(1.0) / uy
    inv_uz = np.float32(1.0) / uz
    rad32 = np.float32(rad)
    sig32 = np.float32(sigma)
    half_width = rad32 / np.float32(math.sqrt(2))
    bin_fctr = np.float32(1.0) / (np.float32(2.0) * half_width /
                                  np.float32(NHIST_PER_DIM))
    nh = np.float32(NHIST_PER_DIM)
    normals, vinv = face_solve_tables()
    faces_idx = face_tables()["idx"]          # (20, 3) i32

    # Tile-aligned accumulation scratch: the flat (16, V) view under the
    # histogram matmul is only a faithful contiguous view when the
    # window dims are (8, 128)-tile aligned (verified on silicon:
    # unaligned ref reshapes silently read pad lanes). Pad columns stay
    # zero (one zero-fill per keypoint), so they add nothing.
    cky_p = -(-cky // 8) * 8
    ckx_p = -(-ckx // 128) * 128

    k = pl.program_id(0)

    @pl.when(act_ref[k] > 0)
    def _():
        # Zero the accumulation scratch once per keypoint: per-plane
        # writes below only touch the (cky, ckx) logical region, and the
        # pad region must be zero (not VMEM garbage) under the flat
        # contraction.
        wplane[...] = jnp.zeros((16, cky_p, ckx_p), jnp.float32)
        tplane[...] = jnp.zeros((48, cky_p, ckx_p), jnp.float32)

        # info column k: [sz, sy, sx, cz, cy, cx, R00..R22] (floats;
        # starts are small integers, exactly representable). Stored
        # TRANSPOSED (15, K) in SMEM: SMEM rows pad to 128 lanes, so the
        # (K, 15) layout would waste 8.5x and overflow SMEM for large
        # flattened batches.
        sz = info_ref[0, k]
        sy = info_ref[1, k]
        sx = info_ref[2, k]
        cz_f = info_ref[3, k]
        cy_f = info_ref[4, k]
        cx_f = info_ref[5, k]
        # We need R^T: rt[i][j] = R[j][i].
        rt = [[info_ref[6 + 3 * j + i, k] for j in range(3)]
              for i in range(3)]

        # Lane/sublane coordinate planes (shared across z).
        x_io = jax.lax.broadcasted_iota(
            jnp.int32, (cky, ckx), 1).astype(jnp.float32)
        y_io = jax.lax.broadcasted_iota(
            jnp.int32, (cky, ckx), 0).astype(jnp.float32)
        vx = (x_io + (sx - cx_f)) * ux
        vy = (y_io + (sy - cy_f)) * uy
        sq_xy = vx * vx + vy * vy

        def z_body(z, hist):
            vz = (z.astype(jnp.float32) + (sz - cz_f)) * uz
            sq = sq_xy + vz * vz
            msk = (sq <= rad32 * rad32).astype(jnp.float32)
            w = jnp.exp(jnp.float32(-0.5) * sq / (sig32 * sig32)) * msk

            # Unit-corrected central differences, Gaussian-weighted
            # (IM_GET_GRAD_ISO; weight applied before rotation like
            # sift.c:1887-1894).
            gx = jnp.float32(0.5) * (win_ref[0, z + 1, 1:1 + cky, 2:2 + ckx] -
                                     win_ref[0, z + 1, 1:1 + cky, 0:ckx]) \
                * inv_ux
            gy = jnp.float32(0.5) * (win_ref[0, z + 1, 2:2 + cky, 1:1 + ckx] -
                                     win_ref[0, z + 1, 0:cky, 1:1 + ckx]) \
                * inv_uy
            gz = jnp.float32(0.5) * (win_ref[0, z + 2, 1:1 + cky, 1:1 + ckx] -
                                     win_ref[0, z, 1:1 + cky, 1:1 + ckx]) \
                * inv_uz
            gx = gx * w
            gy = gy * w
            gz = gz * w

            # Rotate displacement and gradient into the keypoint frame.
            kx = rt[0][0] * vx + rt[0][1] * vy + rt[0][2] * vz
            ky = rt[1][0] * vx + rt[1][1] * vy + rt[1][2] * vz
            kz = rt[2][0] * vx + rt[2][1] * vy + rt[2][2] * vz
            grx = rt[0][0] * gx + rt[0][1] * gy + rt[0][2] * gz
            gry = rt[1][0] * gx + rt[1][1] * gy + rt[1][2] * gz
            grz = rt[2][0] * gx + rt[2][1] * gy + rt[2][2] * gz
            mag2 = grx * grx + gry * gry + grz * grz
            mag = jnp.sqrt(mag2)

            # Icosahedral face: argmax over the 20 outward normals (ties
            # to the lowest index, like the reference first-hit scan).
            best = (np.float32(normals[0, 0]) * grx +
                    np.float32(normals[0, 1]) * gry +
                    np.float32(normals[0, 2]) * grz)
            face = jnp.zeros_like(best)
            for f in range(1, 20):
                s_f = (np.float32(normals[f, 0]) * grx +
                       np.float32(normals[f, 1]) * gry +
                       np.float32(normals[f, 2]) * grz)
                upd = s_f > best
                best = jnp.where(upd, s_f, best)
                face = jnp.where(upd, np.float32(f), face)

            # Barycentrics + bin vertex ids via per-face one-hot
            # accumulation (gather-free).
            b0 = jnp.zeros_like(best)
            b1 = jnp.zeros_like(best)
            b2 = jnp.zeros_like(best)
            vt0 = jnp.zeros_like(best)
            vt1 = jnp.zeros_like(best)
            vt2 = jnp.zeros_like(best)
            for f in range(20):
                sel = (face == np.float32(f)).astype(jnp.float32)
                m = vinv[f]
                b0 = b0 + sel * (np.float32(m[0]) * grx +
                                 np.float32(m[1]) * gry +
                                 np.float32(m[2]) * grz)
                b1 = b1 + sel * (np.float32(m[3]) * grx +
                                 np.float32(m[4]) * gry +
                                 np.float32(m[5]) * grz)
                b2 = b2 + sel * (np.float32(m[6]) * grx +
                                 np.float32(m[7]) * gry +
                                 np.float32(m[8]) * grz)
                vt0 = vt0 + sel * np.float32(faces_idx[f, 0])
                vt1 = vt1 + sel * np.float32(faces_idx[f, 1])
                vt2 = vt2 + sel * np.float32(faces_idx[f, 2])
            ssum = b0 + b1 + b2
            s_ok = ssum > 0
            inv_s = jnp.float32(1.0) / jnp.where(s_ok, ssum,
                                                 jnp.float32(1.0))
            ok = s_ok & (mag2 >= np.float32(BARY_EPS))

            # Spatial bin coordinates in the rotated frame.
            vbx = (kx + half_width) * bin_fctr
            vby = (ky + half_width) * bin_fctr
            vbz = (kz + half_width) * bin_fctr
            inside = ((vbx >= 0) & (vby >= 0) & (vbz >= 0) &
                      (vbx < nh) & (vby < nh) & (vbz < nh))
            gm = mag * inv_s * (ok & inside).astype(jnp.float32)
            g0 = b0 * gm
            g1 = b1 * gm
            g2 = b2 * gm

            # Hat-function per-axis trilinear weights (equivalent to the
            # floor/frac form for in-range coordinates), one full
            # (cky, ckx) plane per histogram slot.
            def hats(vb):
                return [jnp.maximum(1.0 - jnp.abs(vb - np.float32(h)),
                                    0.0) for h in range(NHIST_PER_DIM)]
            az = hats(vbz)
            ay = hats(vby)
            ax = hats(vbx)
            for hz in range(4):
                for hy in range(4):
                    wplane[hz * 4 + hy, :cky, :ckx] = az[hz] * ay[hy]
            for b in range(12):
                fb = np.float32(b)
                G = (g0 * (vt0 == fb).astype(jnp.float32) +
                     g1 * (vt1 == fb).astype(jnp.float32) +
                     g2 * (vt2 == fb).astype(jnp.float32))
                for hx in range(4):
                    tplane[hx * 12 + b, :cky, :ckx] = ax[hx] * G

            # One MXU contraction over the whole plane: flatten the
            # window dims at the REF level (a contiguous view thanks to
            # the tile-aligned scratch; Mosaic rejects vector-level
            # shape casts) and contract (16, V) x (48, V) in a single
            # matmul. Pad columns are zero in T, contributing nothing.
            V = cky_p * ckx_p
            W = wplane.reshape(16, V)[...]
            T = tplane.reshape(48, V)[...]
            # DEFAULT (single-pass bf16 inputs, f32 accumulation; Mosaic
            # lowers only DEFAULT/HIGHEST) instead of HIGHEST's 6 passes:
            # all contraction terms are nonnegative (hat weights x
            # weighted magnitudes), so the ~2^-8 input rounding stays a
            # ~0.4% relative error of each histogram cell, inside the
            # 2e-3-absolute oracle contract. Parity is asserted on
            # silicon every bench.py run (pallas-vs-xla <= 2e-3 gate).
            return hist + jax.lax.dot_general(
                W, T, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        hist = jax.lax.fori_loop(
            0, ckz, z_body, jnp.zeros((16, 48), jnp.float32))
        out_ref[0] = hist

    @pl.when(act_ref[k] == 0)
    def _():
        out_ref[0] = jnp.zeros((16, 48), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cores", "units", "sigma",
                                             "rad", "interpret"))
def _descrip_pallas_call(wins, active, info, *, cores, units, sigma, rad,
                         interpret=False):
    K = wins.shape[0]
    ckz, cky, ckx = cores
    kernel = functools.partial(_descrip_kernel_body, cores=cores,
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
        out_specs=pl.BlockSpec((1, 16, 48), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((16, -(-cky // 8) * 8, -(-ckx // 128) * 128),
                       jnp.float32),
            pltpu.VMEM((48, -(-cky // 8) * 8, -(-ckx // 128) * 128),
                       jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((K, 16, 48), jnp.float32),
        interpret=interpret,
    )(active, info, wins)
    # [hz*4+hy, hx*12+b] -> reference element order
    # el = ((hz*4+hy)*4+hx)*12 + b (sift.c histogram raster).
    return out.reshape(K, 4, 4, 4, 12).reshape(K, 768)


def _window_starts(shape, centers_zyx, radii, cores):
    nz, ny, nx = shape
    Rz, Ry, Rx = radii
    ckz, cky, ckx = cores
    bz = jnp.floor(centers_zyx[:, 0]).astype(jnp.int32)
    by = jnp.floor(centers_zyx[:, 1]).astype(jnp.int32)
    bx = jnp.floor(centers_zyx[:, 2]).astype(jnp.int32)
    return (jnp.clip(bz - Rz, 1, nz - 1 - ckz),
            jnp.clip(by - Ry, 1, ny - 1 - cky),
            jnp.clip(bx - Rx, 1, nx - 1 - ckx))


def _info_rows(sz, sy, sx, centers_zyx, R):
    starts_f = jnp.stack([sz, sy, sx], -1).astype(jnp.float32)
    return jnp.concatenate(
        [starts_f, centers_zyx.astype(jnp.float32),
         R.reshape(-1, 9).astype(jnp.float32)],
        axis=-1).T                                          # (15, K)


@functools.lru_cache(maxsize=512)
def _raw_descrip_fn(radii, cores, units, sigma, rad, interpret):
    """A custom_vmap-wrapped raw-descriptor function for one static level
    geometry. Batching flattens (B, K) keypoint rows into the kernel grid
    and gathers each row's window from its own volume, so batched
    pipelines (parallel.pipeline) hit the same kernel with no per-volume
    dispatch."""
    ckz, cky, ckx = cores

    @jax.custom_batching.custom_vmap
    def raw(level, centers_zyx, R, active):
        sz, sy, sx = _window_starts(level.shape, centers_zyx, radii, cores)

        # XLA window gather: a dynamic-slice map, stacked (K, wz, wy, wx).
        def gather(args):
            z0, y0, x0 = args
            return jax.lax.dynamic_slice(
                level, (z0 - 1, y0 - 1, x0 - 1),
                (ckz + 2, cky + 2, ckx + 2))
        wins = jax.lax.map(gather, (sz, sy, sx))
        info = _info_rows(sz, sy, sx, centers_zyx, R)
        return _descrip_pallas_call(
            wins, active.astype(jnp.int32), info, cores=cores,
            units=units, sigma=sigma, rad=rad, interpret=interpret)

    @raw.def_vmap
    def raw_vmap(axis_size, in_batched, level, centers_zyx, R, active):
        B = axis_size
        lb, cb, rb, ab = in_batched

        def bc(x, batched):
            return x if batched else jnp.broadcast_to(x, (B,) + x.shape)
        level = bc(level, lb)
        centers_zyx = bc(centers_zyx, cb)
        R = bc(R, rb)
        active = bc(active, ab)
        K = centers_zyx.shape[1]
        shape3 = level.shape[1:]
        c2 = centers_zyx.reshape(B * K, 3)
        sz, sy, sx = _window_starts(shape3, c2, radii, cores)
        vol_idx = (jnp.arange(B * K, dtype=jnp.int32) // K)

        def gather(args):
            b, z0, y0, x0 = args
            return jax.lax.dynamic_slice(
                level, (b, z0 - 1, y0 - 1, x0 - 1),
                (1, ckz + 2, cky + 2, ckx + 2))[0]
        wins = jax.lax.map(gather, (vol_idx, sz, sy, sx))
        info = _info_rows(sz, sy, sx, c2, R.reshape(B * K, 3, 3))
        out = _descrip_pallas_call(
            wins, active.reshape(B * K).astype(jnp.int32), info,
            cores=cores, units=units, sigma=sigma, rad=rad,
            interpret=interpret)
        return out.reshape(B, K, 768), True
    return raw


def descrip_level_pallas(level: jax.Array, centers_zyx: jax.Array,
                         R: jax.Array, count, radii, cores,
                         units, sigma: float, rad: float,
                         interpret: bool = False) -> jax.Array:
    """Raw (unnormalized) descriptors for one level bucket.

    Args:
      level: (nz, ny, nx) f32 gaussian pyramid level.
      centers_zyx: (K, 3) f32 keypoint centers (z, y, x order).
      R: (K, 3, 3) f32 rotations.
      count: () i32 number of real rows; rows >= count are skipped and
        return zeros.
      radii: (Rz, Ry, Rx) window half-extents in voxels.
      cores: (cz, cy, cx) clamped core extents (features.windows).
      units: (ux, uy, uz).
      sigma, rad: descriptor Gaussian width and window radius (mm).

    Returns (K, 768) f32 raw histograms (pre-postprocess). vmaps over a
    leading batch axis by flattening rows into the kernel grid.
    """
    K = centers_zyx.shape[0]
    active = (jnp.arange(K, dtype=jnp.int32) <
              jnp.asarray(count, jnp.int32)).astype(jnp.int32)
    fn = _raw_descrip_fn(
        tuple(int(r) for r in radii), tuple(int(c) for c in cores),
        (float(units[0]), float(units[1]), float(units[2])),
        float(sigma), float(rad), bool(interpret) if isinstance(
            interpret, bool) else interpret)
    return fn(level, centers_zyx.astype(jnp.float32),
              R.astype(jnp.float32), active)
