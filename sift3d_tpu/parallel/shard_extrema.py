"""Spatially-sharded DoG extrema detection.

Extends the z-sharding of the scale-space convolutions (shard_conv)
through the extrema scan (SURVEY §5.7): each shard detects extrema on
its own z slab using a 1-plane halo of the current DoG level (the
6-neighborhood needs z +- 1; the prev/next levels contribute only their
center voxels, reference sift.c:1138-1150), the per-level DoG max - the
relative peak threshold's normalizer (sift.c:1162-1169) - is a ``pmax``
over the axis, and the per-shard scan-order compactions merge with an
all_gather + re-reduction on global scan keys.

The merged result is bit-identical to features.extrema.level_extrema on
the gathered volume: shard z-slabs are contiguous in the global (z, y,
x) scan order, so the globally-first ``capacity`` extrema are a subset
of the union of each shard's locally-first ``capacity``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .shard_conv import shard_halo


def _local_scan(cur_h, prev_l, nxt_l, t, z0, nz, capacity):
    """Extrema of one shard's slab. cur_h has a 1-plane z halo; z0 is the
    slab's global z offset; returns (keys, idx_global, count_local)."""
    L = prev_l.shape[0]
    ny, nx = prev_l.shape[1], prev_l.shape[2]

    c = cur_h[1:-1, 1:-1, 1:-1]            # (L, ny-2, nx-2) centers
    peak_ok = (c > t) | (c < -t)

    cur_n = (cur_h[1:-1, 1:-1, 2:], cur_h[1:-1, 1:-1, :-2],
             cur_h[1:-1, 2:, 1:-1], cur_h[1:-1, :-2, 1:-1],
             cur_h[:-2, 1:-1, 1:-1], cur_h[2:, 1:-1, 1:-1])
    p_c = prev_l[:, 1:-1, 1:-1]
    n_c = nxt_l[:, 1:-1, 1:-1]

    is_max = (c > p_c) & (c > n_c)
    is_min = (c < p_c) & (c < n_c)
    for nb in cur_n:
        is_max &= c > nb
        is_min &= c < nb
    mask = peak_ok & (is_max | is_min)

    # Global interior bound: z in [1, nz-2].
    zg = z0 + jnp.arange(L, dtype=jnp.int32)
    mask &= ((zg >= 1) & (zg <= nz - 2))[:, None, None]

    inner_ny, inner_nx = ny - 2, nx - 2
    n_glob = (nz - 2) * inner_ny * inner_nx
    # Global scan-order linear index of local voxel (j, y-1, x-1).
    ig = ((zg - 1)[:, None, None] * (inner_ny * inner_nx) +
          jnp.arange(inner_ny, dtype=jnp.int32)[None, :, None] * inner_nx +
          jnp.arange(inner_nx, dtype=jnp.int32)[None, None, :])
    flat = mask.reshape(-1)
    key = jnp.where(flat, jnp.int32(n_glob) - ig.reshape(-1), jnp.int32(0))
    count_l = jnp.sum(flat.astype(jnp.int32))
    k = min(capacity, key.shape[0])
    vals, pos = jax.lax.top_k(key, k)
    idx_g = jnp.where(vals > 0, jnp.int32(n_glob) - vals, 0)
    if k < capacity:
        vals = jnp.pad(vals, (0, capacity - k))
        idx_g = jnp.pad(idx_g, (0, capacity - k))
    return vals, idx_g, count_l


def level_extrema_sharded(prev: jax.Array, cur: jax.Array, nxt: jax.Array,
                          peak_thresh: float, capacity: int, mesh: Mesh,
                          axis_name: str = "space",
                          batch_axis_name: str = "data"):
    """Sharded-z analog of features.extrema.level_extrema.

    Args:
      prev, cur, nxt: (B, nz, ny, nx) batched DoG levels, z sharded over
        ``axis_name`` (nz divisible by the axis size).
      capacity: max keypoints per volume.

    Returns (zyx (B, capacity, 3) i32, count (B,) i32), identical to the
    unsharded detector (rows in global scan order).
    """
    B, nz, ny, nx = cur.shape
    n_sh = mesh.shape[axis_name]
    assert nz % n_sh == 0, f"nz={nz} not divisible by {n_sh} shards"
    L = nz // n_sh

    def local(prev_l, cur_l, nxt_l):
        s = jax.lax.axis_index(axis_name)
        t_local = jnp.max(jnp.abs(cur_l))
        t = jax.lax.pmax(t_local, axis_name) * \
            jnp.asarray(peak_thresh, cur_l.dtype)
        cur_h = shard_halo(cur_l, 1, axis_name, z_axis=1)
        z0 = (s * L).astype(jnp.int32)

        def one(ph, ch, nh):
            return _local_scan(ch, ph, nh, t, z0, nz, capacity)
        vals, idx_g, count_l = jax.vmap(one)(prev_l, cur_h, nxt_l)

        # Merge shards: gather each shard's top-capacity keys and re-take
        # the global top capacity (keys descend with scan order).
        g_vals = jax.lax.all_gather(vals, axis_name, axis=1)   # (B, S, C)
        g_idx = jax.lax.all_gather(idx_g, axis_name, axis=1)
        count = jnp.minimum(jax.lax.psum(count_l, axis_name),
                            capacity).astype(jnp.int32)

        def merge(v, i, cnt):
            mv, pos = jax.lax.top_k(v.reshape(-1), capacity)
            mi = jnp.take(i.reshape(-1), pos)
            inner_ny, inner_nx = ny - 2, nx - 2
            zz = mi // (inner_ny * inner_nx) + 1
            yy = (mi // inner_nx) % inner_ny + 1
            xx = mi % inner_nx + 1
            zyx = jnp.stack([zz, yy, xx], -1).astype(jnp.int32)
            keep = (jnp.arange(capacity) < cnt) & (mv > 0)
            return jnp.where(keep[:, None], zyx, 0)
        zyx = jax.vmap(merge)(g_vals, g_idx, count)
        return zyx, count

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axis_name, axis_name, None, None),) * 3,
        out_specs=(P(batch_axis_name, None, None),
                   P(batch_axis_name)),
        check_vma=False,
    )(prev, cur, nxt)
