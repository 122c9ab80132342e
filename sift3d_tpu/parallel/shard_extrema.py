"""Spatially-sharded DoG extrema detection.

Extends the spatial sharding of the scale-space convolutions
(shard_conv) through the extrema scan (SURVEY §5.7): each shard detects
extrema on its own slab of the sharded spatial axis using a 1-plane halo
of the current DoG level (the 6-neighborhood needs +-1 along every axis;
the prev/next levels contribute only their center voxels, reference
sift.c:1138-1150), the per-level DoG max - the relative peak threshold's
normalizer (sift.c:1162-1169) - is a ``pmax`` over the axis, and the
per-shard scan-order compactions merge with an all_gather + re-reduction
on global scan keys.

Any spatial axis can shard (``shard_dim`` "z"/"y"/"x", like shard_conv
and shard_windows): the merge is on *global* scan-order keys, and every
globally-first extremum is also locally-first within its own shard, so
the merged result is bit-identical to features.extrema.level_extrema on
the gathered volume regardless of which axis was sliced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .shard_conv import shard_halo

_DIMS = {"z": 0, "y": 1, "x": 2}


def _axis_slices(ndim, axis, center_rest):
    """(plus, minus) neighbor slicers along ``axis``; ``center_rest``
    slices every other axis to its center range [1:-1]."""
    plus = list(center_rest)
    minus = list(center_rest)
    plus[axis] = slice(2, None)
    minus[axis] = slice(0, -2)
    return tuple(plus), tuple(minus)


def _local_scan(cur_h, prev_l, nxt_l, t, a0, n3, sd, capacity):
    """Extrema of one shard's slab. cur_h has a 1-plane halo on spatial
    dim ``sd``; a0 is the slab's global offset along it; returns
    (keys, idx_global, count_local)."""
    S = prev_l.shape[sd]                  # local rows of the sharded axis
    center = [slice(1, -1)] * 3           # halo trim (sd) / interior (rest)
    c = cur_h[tuple(center)]
    peak_ok = (c > t) | (c < -t)

    prev_center = [slice(1, -1)] * 3
    prev_center[sd] = slice(None)         # prev/nxt have no halo
    p_c = prev_l[tuple(prev_center)]
    n_c = nxt_l[tuple(prev_center)]

    is_max = (c > p_c) & (c > n_c)
    is_min = (c < p_c) & (c < n_c)
    for axis in range(3):
        plus, minus = _axis_slices(3, axis, center)
        for nb in (cur_h[plus], cur_h[minus]):
            is_max &= c > nb
            is_min &= c < nb
    mask = peak_ok & (is_max | is_min)

    # Global coordinate grids over the core (sharded axis: all S local
    # rows at offset a0, globally interior-masked; others: [1, n-2]).
    grids = []
    for d in range(3):
        if d == sd:
            g = a0 + jnp.arange(S, dtype=jnp.int32)
        else:
            g = 1 + jnp.arange(n3[d] - 2, dtype=jnp.int32)
        shape = [1, 1, 1]
        shape[d] = g.shape[0]
        grids.append(g.reshape(shape))
    zg, yg, xg = grids
    mask &= (grids[sd] >= 1) & (grids[sd] <= n3[sd] - 2)

    inner = tuple(n - 2 for n in n3)
    n_glob = inner[0] * inner[1] * inner[2]
    # Global scan-order linear index (z-major, like the reference's scan).
    ig = ((zg - 1) * (inner[1] * inner[2]) + (yg - 1) * inner[2] +
          (xg - 1))
    ig = jnp.broadcast_to(ig, mask.shape)
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
                          batch_axis_name: str = "data",
                          shard_dim: str = "z"):
    """Spatially-sharded analog of features.extrema.level_extrema.

    Args:
      prev, cur, nxt: (B, nz, ny, nx) batched DoG levels, the
        ``shard_dim`` axis sharded over ``axis_name`` (extent divisible
        by the axis size).
      capacity: max keypoints per volume.

    Returns (zyx (B, capacity, 3) i32, count (B,) i32, total (B,) i32),
    identical to the unsharded detector (rows in global scan order);
    ``total`` is the unclamped extrema count (truncation iff
    total > capacity), matching features.extrema.level_extrema.
    """
    B, nz, ny, nx = cur.shape
    sd = _DIMS[shard_dim]
    n3 = (nz, ny, nx)
    n_sh = mesh.shape[axis_name]
    assert n3[sd] % n_sh == 0, \
        f"{shard_dim} extent {n3[sd]} not divisible by {n_sh} shards"
    S = n3[sd] // n_sh

    spec = [batch_axis_name, None, None, None]
    spec[1 + sd] = axis_name

    def local(prev_l, cur_l, nxt_l):
        s = jax.lax.axis_index(axis_name)
        t_local = jnp.max(jnp.abs(cur_l))
        t = jax.lax.pmax(t_local, axis_name) * \
            jnp.asarray(peak_thresh, cur_l.dtype)
        cur_h = shard_halo(cur_l, 1, axis_name, z_axis=1 + sd)
        a0 = (s * S).astype(jnp.int32)

        def one(ph, ch, nh):
            return _local_scan(ch, ph, nh, t, a0, n3, sd, capacity)
        vals, idx_g, count_l = jax.vmap(one)(prev_l, cur_h, nxt_l)

        # Merge shards: gather each shard's top-capacity keys and re-take
        # the global top capacity (keys descend with scan order).
        g_vals = jax.lax.all_gather(vals, axis_name, axis=1)   # (B, S, C)
        g_idx = jax.lax.all_gather(idx_g, axis_name, axis=1)
        total = jax.lax.psum(count_l, axis_name).astype(jnp.int32)
        count = jnp.minimum(total, capacity).astype(jnp.int32)

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
        return zyx, count, total

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(*spec),) * 3,
        out_specs=(P(batch_axis_name, None, None),
                   P(batch_axis_name),
                   P(batch_axis_name)),
        check_vma=False,
    )(prev, cur, nxt)
