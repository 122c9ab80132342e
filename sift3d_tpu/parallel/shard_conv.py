"""Spatially-sharded separable convolution with halo exchange.

The volume is sharded along z over the mesh axis "space" (the
sequence/context-parallel analog - SURVEY §5.7). The x and y passes of the
separable convolution are local to each shard (full-width banded matmuls,
exactly the single-chip kernel in ops/conv.py). The z pass needs
out-of-shard voxels: each shard exchanges an H-voxel halo slab with its
neighbors over ICI via `jax.lax.ppermute`, then applies its precomputed
block of the global convolution matrix.

Correctness is exact (not approximate): the global banded matrix W from
ops/conv.py - which already encodes the reference's mm-unit interpolated
taps and mirror boundary (imutil.c:2274-2393) - is sliced per shard into
W[rows_s, cols in window_s]. H is the true maximum band spread of W, so
every nonzero column of a shard's rows is covered by [local - H, local + H].
Out-of-volume window columns are structurally zero in W, which is why edge
shards can take ppermute's zero-filled halos.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import conv


@functools.lru_cache(maxsize=None)
def _block_matrices(taps_key, unit: float, unit_dim: float, n: int,
                    n_shards: int):
    """Per-shard z-pass matrix blocks: (S, L, L + 2H) float32, plus H."""
    taps = np.asarray(taps_key, np.float32)
    W = conv.conv_matrix(taps, unit, unit_dim, n)        # (n, n)
    rows, cols = np.nonzero(W)
    H = int(np.max(np.abs(cols - rows))) if len(rows) else 0
    L = n // n_shards
    assert L * n_shards == n, f"z extent {n} not divisible by {n_shards}"
    assert H <= L, (f"halo {H} exceeds shard length {L}; use fewer spatial "
                    f"shards for this volume")
    Wp = np.zeros((n, n + 2 * H), np.float32)
    Wp[:, H:H + n] = W
    blocks = np.stack([Wp[s * L:(s + 1) * L, s * L:s * L + L + 2 * H]
                       for s in range(n_shards)])
    return blocks, H


def shard_halo(x_local: jax.Array, H: int, axis_name: str, z_axis: int):
    """Exchange H-voxel halos along ``z_axis`` with mesh neighbors.

    Returns the local block extended by H voxels on both z sides; global
    edges are zero-filled (ppermute drops unpaired sends), which matches
    the structurally-zero out-of-volume columns of the convolution matrix.
    """
    n_sh = jax.lax.psum(1, axis_name)
    if H == 0 or n_sh == 1:
        pad = [(0, 0)] * x_local.ndim
        pad[z_axis] = (H, H)
        return jnp.pad(x_local, pad)
    idx = [slice(None)] * x_local.ndim

    idx[z_axis] = slice(x_local.shape[z_axis] - H, None)
    lo = jax.lax.ppermute(x_local[tuple(idx)], axis_name,
                          [(i, i + 1) for i in range(n_sh - 1)])
    idx[z_axis] = slice(0, H)
    hi = jax.lax.ppermute(x_local[tuple(idx)], axis_name,
                          [(i + 1, i) for i in range(n_sh - 1)])
    return jnp.concatenate([lo, x_local, hi], axis=z_axis)


def conv_sep_sharded(vol: jax.Array, taps: np.ndarray, unit: float,
                     units: tuple[float, float, float], mesh: Mesh,
                     axis_name: str = "space",
                     batch_axis_name: str | None = "data",
                     shard_dim: str = "z") -> jax.Array:
    """Separable mm-unit convolution of a spatially-sharded volume.

    Args:
      vol: (nz, ny, nx) or (B, nz, ny, nx) global array; the
        ``shard_dim`` spatial axis ("z", "y" or "x") is sharded over
        ``axis_name``, batch (if present) over ``batch_axis_name``.
      taps, unit, units: as ops.conv.conv_sep.
      mesh: the device mesh.

    Returns the convolved volume with the same sharding. The two
    unsharded axes run the local single-chip kernel; the sharded axis
    exchanges an H-voxel ppermute halo and applies its precomputed
    block of the global convolution matrix (module docstring).

    The sharded axis is always applied last, so for shard_dim "y"/"x"
    the pass order differs from the reference's x-y-z
    (apply_Sep_FIR_filter, imutil.c:3494-3526) - equal up to f32
    rounding (the passes commute); bit-parity paths use "z".
    """
    batched = vol.ndim == 4
    dims = {"z": 0, "y": 1, "x": 2}
    sd = dims[shard_dim]
    n3 = vol.shape[-3:]                      # (nz, ny, nx)
    u3 = (units[2], units[1], units[0])      # per-dim units, zyx order
    n_shards = mesh.shape[axis_name]
    taps_key = tuple(np.asarray(taps, np.float32).tolist())
    blocks, H = _block_matrices(taps_key, float(unit), float(u3[sd]),
                                n3[sd], n_shards)
    blocks = jnp.asarray(blocks)
    # Full matrices for the two locally-convolved axes.
    W_loc = {d: jnp.asarray(conv.conv_matrix(taps, unit, u3[d], n3[d]))
             for d in range(3) if d != sd}

    off = 1 if batched else 0
    s_axis = off + sd

    def local(x, W_blk):
        for d in (2, 1, 0):                  # reference order: x, y, z
            if d == sd:
                continue
            x = conv.conv_axis(x, W_loc[d], off + d)
        xext = shard_halo(x, H, axis_name, s_axis)       # halos over ICI
        out = jnp.tensordot(W_blk[0].astype(x.dtype), xext,
                            axes=([1], [s_axis]),
                            precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out, 0, s_axis)

    spatial = [None, None, None]
    spatial[sd] = axis_name
    if batched:
        vspec = P(batch_axis_name, *spatial)
    else:
        vspec = P(*spatial)
    wspec = P(axis_name, None, None)

    return shard_map(local, mesh=mesh, in_specs=(vspec, wspec),
                     out_specs=vspec)(vol, blocks)
