"""Separable convolution in physical (mm) units.

The reference convolves each axis with a FIR filter whose taps are spaced
``unit`` mm apart, sampling the image with 1-D linear interpolation at
fractional voxel positions, and mirrors sampling coordinates at the
boundaries (reference imutil.c:2274-2393, apply_Sep_FIR_filter
imutil.c:3459-3544).

Because that operation is *linear* in the input, each 1-D pass is exactly a
banded n x n matrix applied along one axis. We precompute that matrix on the
host (float64 accumulation of float32-faithful per-sample weights) and apply
it as a dense matmul on the MXU. Interior rows are the shift-invariant
"dense equivalent kernel" (each tap splits into two adjacent voxels by its
linear-interpolation fraction); boundary rows encode the reference's exact
mirror formula, including its 0.1-voxel epsilon and truncation-toward-zero
index semantics.

This is the TPU-idiomatic replacement for the reference's OpenMP
convolve_sep_gen: one matmul per axis, fully fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CONV_EPS


@functools.lru_cache(maxsize=None)
def _conv_matrix_cached(taps_key, unit: float, unit_dim: float, n: int) -> np.ndarray:
    taps = np.asarray(taps_key, dtype=np.float32)
    return _make_conv_matrix(taps, unit, unit_dim, n)


def conv_matrix(taps: np.ndarray, unit: float, unit_dim: float, n: int) -> np.ndarray:
    """Banded convolution matrix W (n x n, float32): out = W @ signal.

    Args:
      taps: float32 filter taps, odd length 2*hw+1.
      unit: physical spacing of the filter taps (mm).
      unit_dim: physical voxel spacing of the image along this axis (mm).
      n: axis length.
    """
    return _conv_matrix_cached(tuple(np.asarray(taps, np.float32).tolist()),
                               float(unit), float(unit_dim), int(n))


def _make_conv_matrix(taps: np.ndarray, unit: float, unit_dim: float,
                      n: int) -> np.ndarray:
    hw = (len(taps) - 1) // 2
    # unit_factor is computed in float32 in the reference (imutil.c:2286-2287)
    uf = np.float32(unit / unit_dim)
    dim_end = n - 1
    d = np.arange(-hw, hw + 1, dtype=np.float32)
    step = d * uf                                    # float32, like the C code
    x = np.arange(n, dtype=np.float32)
    coords = x[:, None] - step[None, :]              # (n, ntaps), float32

    # Mirror boundaries exactly as convolve_sep_gen's second pass
    # (imutil.c:2375-2382). Conditions use truncation toward zero.
    lo0 = np.trunc(coords).astype(np.int64)
    neg = lo0 < 0
    coords = np.where(neg, (-coords).astype(np.float32), coords)
    hi = np.logical_and(~neg, np.trunc(coords).astype(np.int64) >= dim_end)
    coords = np.where(
        hi,
        (np.float32(2.0 * dim_end) - coords - np.float32(CONV_EPS)).astype(np.float32),
        coords)

    lo = np.trunc(coords).astype(np.int64)
    frac = (coords - lo.astype(np.float32)).astype(np.float32)
    # Clamp for safety (the reference reads out of bounds here; only reachable
    # for filters wider than the image, which the pyramid geometry forbids).
    lo_c = np.clip(lo, 0, n - 1)
    hi_c = np.clip(lo + 1, 0, n - 1)

    W = np.zeros((n, n), dtype=np.float64)
    rows = np.repeat(np.arange(n), len(taps))
    t64 = taps.astype(np.float64)[None, :] * np.ones((n, 1))
    np.add.at(W, (rows, lo_c.ravel()),
              (t64 * (1.0 - frac.astype(np.float64))).ravel())
    np.add.at(W, (rows, hi_c.ravel()),
              (t64 * frac.astype(np.float64)).ravel())
    return W.astype(np.float32)


def unit_half_width(taps_len: int, unit: float, unit_dim: float) -> int:
    """Half-width of the convolution's input footprint in voxels
    (imutil.c:2288-2289)."""
    hw = (taps_len - 1) // 2
    uf = np.float32(unit / unit_dim)
    return int(np.ceil(np.float32(hw) * uf))


def conv_axis(vol: jax.Array, W: jax.Array | np.ndarray, axis: int) -> jax.Array:
    """Apply a 1-D convolution matrix along ``axis`` of ``vol``.

    Uses dot_general with the output dimension in place (no moveaxis):
    tensordot + moveaxis would lower to an explicit transpose on TPU,
    costing a full extra HBM round trip per pass.
    """
    W = jnp.asarray(W, dtype=vol.dtype)
    axis = axis % vol.ndim
    if axis == vol.ndim - 1:
        # (..., j) x (i, j) -> (..., i): output already in place.
        dn = (((axis,), (1,)), ((), ()))
        return jax.lax.dot_general(vol, W, dn,
                                   precision=jax.lax.Precision.HIGHEST)
    # Batched matmul: leading dims are batch, W broadcast per batch.
    # Output = batch + (n_out,) + trailing = original layout, in place.
    batch = tuple(range(axis))
    Wb = jnp.broadcast_to(W, vol.shape[:axis] + W.shape)
    dn = (((axis + 2 - 1,), (axis,)), (batch, batch))
    return jax.lax.dot_general(Wb, vol, dn,
                               precision=jax.lax.Precision.HIGHEST)


# Axis length above which the framed (banded-tile) formulation replaces
# the dense matmul. MEASURED on the tpu-v5e chip (benches/
# bench_conv_crossover.py, git 4de0e81+, 11-tap sigma=1.6 filter, 3-axis
# pass, min-of-5): the dense matmul wins at EVERY tested size - banded
# speedup 1.00x @128, 0.97x @192, 0.94x @256, 0.57x @384, 0.47x @512 -
# the MXU absorbs the O(n) MACs/voxel below the HBM floor while the
# framed path pays real frame-gather/pad traffic. (Round 2's "25x wasted
# FLOPs at n=512" reasoning was FLOP-counting; the hardware disagrees.)
# The sentinel routes everything through the matmul; the framed path
# stays available via conv_axis_banded / apply_banded_matrix and is
# exercised by tests (test_conv_pyramid monkeypatches this threshold).
BANDED_MIN_N = 10 ** 9

# Output rows per banded tile: one MXU-sublane-aligned block. Each tile
# issues (FRAME_TILE + 2H) MACs/output voxel on the MXU instead of the
# dense matmul's n - e.g. ~146 vs 512 for the dense-descriptor blur at
# n = 512 - while keeping temporaries at ~(1 + 2H/T) x the volume.
# (Round 3's shift-multiply-add diagonal chain was O(taps) on paper but
# materialized one shifted volume copy per diagonal under XLA's
# rematerializer: 18 x 512 MB live temps OOM'd the 16 GB chip at 512^3.)
FRAME_TILE = 128


def band_half_width(W: np.ndarray) -> int:
    """Max |col - row| over the nonzeros of a square banded matrix."""
    rows, cols = np.nonzero(W)
    return int(np.abs(cols - rows).max()) if len(rows) else 0


def banded_frame_tiles(W: np.ndarray, tile: int = FRAME_TILE):
    """Decompose a square banded matrix into per-tile weight blocks.

    Returns (H, tiles) with tiles (ntiles, T, T + 2H) float32 such that
    ``(W @ x)[t*T : (t+1)*T] == tiles[t] @ xp[t*T : t*T + T + 2H]`` where
    ``xp`` is x zero-padded by H low and H + (n_pad - n) high. Exact: the
    boundary tiles carry W's actual mirror rows; interior tiles are the
    (identical) Toeplitz block."""
    n = W.shape[0]
    H = band_half_width(W)
    T = min(tile, n)
    ntiles = -(-n // T)
    n_pad = ntiles * T
    Wp = np.zeros((n_pad, n_pad + 2 * H), np.float32)
    Wp[:n, H:H + n] = W
    tiles = np.stack([Wp[t * T:(t + 1) * T, t * T:t * T + T + 2 * H]
                      for t in range(ntiles)])
    return H, tiles


def _apply_frame_tiles(vol: jax.Array, H: int, tiles: np.ndarray,
                       axis: int) -> jax.Array:
    """Apply a banded operator in (H, tiles) form along ``axis``: gather
    overlapping frames of T + 2H samples, then one batched MXU matmul per
    tile row-block. Work is O(T + 2H) MACs/voxel independent of n, and
    peak temporaries are ~(1 + 2H/T) x the volume."""
    axis = axis % vol.ndim
    n = vol.shape[axis]
    ntiles, T, K = tiles.shape
    n_pad = ntiles * T
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (H, H + n_pad - n)
    xp = jnp.pad(vol, pad)
    frames = jnp.stack(
        [jax.lax.slice_in_dim(xp, t * T, t * T + K, axis=axis)
         for t in range(ntiles)], axis=axis)
    Wt = jnp.asarray(tiles, vol.dtype)
    batch = tuple(range(axis))
    Wb = jnp.broadcast_to(Wt, vol.shape[:axis] + Wt.shape)
    # lhs Wb: batch + (ntiles, T, K); rhs frames: batch + (ntiles, K) +
    # trailing. Result: batch + (ntiles, T) + trailing = output in place.
    dn = (((axis + 2,), (axis + 1,)),
          (batch + (axis,), batch + (axis,)))
    out = jax.lax.dot_general(Wb, frames, dn,
                              precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(vol.shape[:axis] + (n_pad,) + vol.shape[axis + 1:])
    if n_pad != n:
        out = jax.lax.slice_in_dim(out, 0, n, axis=axis)
    return out


def apply_banded_matrix(vol: jax.Array, W: np.ndarray,
                        axis: int) -> jax.Array:
    """Apply an arbitrary square banded matrix (host numpy) along
    ``axis`` via the framed-tile formulation. Falls back to the dense
    matmul when the band is so wide (e.g. heavily composed pyramid
    operators) that framing would not reduce the per-voxel work."""
    W = np.asarray(W, np.float32)
    n = W.shape[0]
    H = band_half_width(W)
    if min(FRAME_TILE, n) + 2 * H >= n:
        return conv_axis(vol, W, axis)
    H, tiles = banded_frame_tiles(W)
    return _apply_frame_tiles(vol, H, tiles, axis)


@functools.lru_cache(maxsize=None)
def _frame_tiles_cached(taps_key, unit: float, unit_dim: float, n: int):
    return banded_frame_tiles(
        _conv_matrix_cached(taps_key, unit, unit_dim, n))


def conv_axis_banded(vol: jax.Array, taps: np.ndarray, unit: float,
                     unit_dim: float, axis: int) -> jax.Array:
    """The same exact banded operator as ``conv_axis`` (identical matrix,
    including mm-unit interpolated taps and mirror boundary rows) applied
    via framed tiles: O(T + 2H) work per voxel instead of the matmul's
    O(n)."""
    n = vol.shape[axis % vol.ndim]
    H, tiles = _frame_tiles_cached(
        tuple(np.asarray(taps, np.float32).tolist()),
        float(unit), float(unit_dim), n)
    return _apply_frame_tiles(vol, H, tiles, axis)


def conv_sep(vol: jax.Array, taps: np.ndarray, unit: float,
             units: tuple[float, float, float]) -> jax.Array:
    """Full separable pass over (z, y, x)-ordered volume.

    Matches apply_Sep_FIR_filter's dimension order x, then y, then z
    (imutil.c:3494-3526). ``units`` is (ux, uy, uz). Axes longer than
    BANDED_MIN_N take the banded diagonal path; shorter axes ride the
    MXU matmul."""
    dims = (vol.ndim - 1, vol.ndim - 2, vol.ndim - 3)
    for axis, u in zip(dims, units):
        n = vol.shape[axis]
        if n >= BANDED_MIN_N:
            vol = conv_axis_banded(vol, taps, unit, u, axis)
        else:
            vol = conv_axis(vol, conv_matrix(taps, unit, u, n), axis)
    return vol
