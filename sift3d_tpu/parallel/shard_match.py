"""Sharded descriptor matching.

For descriptor sets too large for one chip's memory (the N1 x N2 SSD
matrix dominates), d2 is sharded over a mesh axis: each shard computes its
local (N1, N2/S) distance block on the MXU, reduces it to per-query top-2
(value, index) triples, and the triples are combined across shards with an
all_gather - the score pass of a ring/AG attention pattern (SURVEY §5.7).
The backward (d2 -> d1) argmin of the forward-backward check runs locally
per shard (each shard owns its d2 rows) and is gathered once.

Semantics match features.match.nn_match, with one documented exception:
exact SSD ties between candidates on different shards may resolve to a
different index than the reference's strict scan order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..features.match import ssd_matrix, _ratio_accept, _top2_min


def nn_match_sharded(d1: jax.Array, d2: jax.Array, nn_thresh: float,
                     mesh: Mesh, axis_name: str = "space",
                     valid1: jax.Array | None = None,
                     valid2: jax.Array | None = None,
                     dtype=jnp.float32, streamed: bool | None = None,
                     streamed_threshold: int | None = None
                     ) -> jax.Array:
    """Match d1 (replicated) against d2 (sharded along rows).

    Args:
      d1: (N1, 768); d2: (N2, 768), N2 divisible by the axis size.
      valid1/valid2: optional row-validity masks.
      streamed: use the Pallas streaming reduction for the per-shard
        local top-2 (O(N1 + N2/S) HBM per shard instead of the
        (N1, N2/S) block). Default: on TPU once the local block exceeds
        ``streamed_threshold`` entries (MatchParams.streamed_threshold).

    Returns (N1,) int32 matches (replicated on every shard).
    """
    n1, n2 = d1.shape[0], d2.shape[0]
    n_sh = mesh.shape[axis_name]
    assert n2 % n_sh == 0, f"N2={n2} not divisible by {n_sh} shards"
    n2_loc = n2 // n_sh
    if valid1 is None:
        valid1 = jnp.ones((n1,), bool)
    if valid2 is None:
        valid2 = jnp.ones((n2,), bool)
    on_tpu = jax.default_backend() == "tpu"
    if streamed is None:
        if streamed_threshold is None:
            from ..config import MatchParams
            streamed_threshold = MatchParams().streamed_threshold
        streamed = on_tpu and n1 * n2_loc >= streamed_threshold

    def local(d1_r, d2_blk, v1, v2_blk):
        s = jax.lax.axis_index(axis_name)
        if streamed:
            from ..ops.pallas_match import match_reduce_streamed
            fbest, fsecond, fidx, bbest, bsecond, bidx = \
                match_reduce_streamed(d1_r, d2_blk, valid1=v1,
                                      valid2=v2_blk,
                                      interpret=not on_tpu)
        else:
            D = ssd_matrix(d1_r, d2_blk, dtype)       # (N1, n2_loc)
            inf = jnp.asarray(jnp.inf, D.dtype)
            D = jnp.where(v2_blk[None, :], D, inf)
            D = jnp.where(v1[:, None], D, inf)
            fidx, fbest, fsecond = _top2_min(D, axis=1)
            bidx, bbest, bsecond = _top2_min(D, axis=0)
        # Global d2 indices for the local forward winners.
        fidx = fidx + s * n2_loc

        # Gather per-shard candidates: (S, N1) each; combine to global
        # top-2 by stacking each shard's {best, second} and re-reducing.
        g_best = jax.lax.all_gather(fbest, axis_name)        # (S, N1)
        g_second = jax.lax.all_gather(fsecond, axis_name)
        g_idx = jax.lax.all_gather(fidx, axis_name)
        cand_vals = jnp.concatenate([g_best, g_second], 0)   # (2S, N1)
        cand_idx = jnp.concatenate([g_idx, jnp.zeros_like(g_idx)], 0)
        neg, pos = jax.lax.top_k(-cand_vals.T, 2)            # (N1, 2)
        best = -neg[:, 0]
        second = -neg[:, 1]
        best_idx = jnp.take_along_axis(cand_idx.T, pos[:, :1], 1)[:, 0]
        fwd_ok = _ratio_accept(best, second, nn_thresh)

        # Backward direction (this shard's d2 rows vs all of d1, local).
        bwd_ok_l = _ratio_accept(bbest, bsecond, nn_thresh)
        bwd_idx = jax.lax.all_gather(bidx, axis_name).reshape(n2)
        bwd_ok = jax.lax.all_gather(bwd_ok_l, axis_name).reshape(n2)

        consistent = (bwd_idx[best_idx] ==
                      jnp.arange(n1, dtype=jnp.int32)) & bwd_ok[best_idx]
        any_v2 = jax.lax.all_gather(jnp.any(v2_blk), axis_name)
        ok = fwd_ok & consistent & v1 & jnp.any(any_v2)
        return jnp.where(ok, best_idx, -1).astype(jnp.int32)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), P(axis_name, None), P(None), P(axis_name)),
        out_specs=P(None),
        check_vma=False,   # result is replicated by the all_gathers
    )(d1, d2, valid1, valid2)


def _merge_top2(best, second, idx, nb, ns, ni):
    """Merge two per-row (best, second, idx) candidate sets."""
    cand = jnp.stack([best, second, nb, ns], -1)         # (n, 4)
    cidx = jnp.stack([idx, jnp.zeros_like(idx),
                      ni, jnp.zeros_like(ni)], -1)
    neg, pos = jax.lax.top_k(-cand, 2)
    return (-neg[:, 0], -neg[:, 1],
            jnp.take_along_axis(cidx, pos[:, :1], 1)[:, 0])


def nn_match_ring(d1: jax.Array, d2: jax.Array, nn_thresh: float,
                  mesh: Mesh, axis_name: str = "space",
                  valid1: jax.Array | None = None,
                  valid2: jax.Array | None = None,
                  dtype=jnp.float32) -> jax.Array:
    """Fully-sharded matching: BOTH descriptor sets sharded over the
    axis; d2 blocks rotate around the ring via ``ppermute`` (the
    ring-attention score-pass analog, SURVEY §5.7) so no shard ever
    holds more than (N1 + N2)/S descriptor rows - unlike
    :func:`nn_match_sharded`, which replicates d1.

    Each ring step computes one (N1/S, N2/S) MXU distance block, folds
    it into the local d1 rows' running forward top-2 (with global d2
    indices), and folds the transposed reduction into a backward top-2
    state that TRAVELS with the d2 block, so after S steps every d2 row
    has seen every d1 row. The small per-row (value, index) backward
    state is all_gathered once for the forward-backward consistency
    check (sift.c:2881-2884); ties across shards may resolve to a
    different index than the reference's scan order (same caveat as
    nn_match_sharded).

    Args:
      d1: (N1, 768); d2: (N2, 768); both N1 and N2 divisible by the
        axis size.
    Returns (N1,) int32 matches (replicated).
    """
    n1, n2 = d1.shape[0], d2.shape[0]
    n_sh = mesh.shape[axis_name]
    assert n1 % n_sh == 0 and n2 % n_sh == 0, (n1, n2, n_sh)
    n1_loc, n2_loc = n1 // n_sh, n2 // n_sh
    if valid1 is None:
        valid1 = jnp.ones((n1,), bool)
    if valid2 is None:
        valid2 = jnp.ones((n2,), bool)
    perm = [(i, (i + 1) % n_sh) for i in range(n_sh)]

    def local(d1_blk, d2_blk, v1_blk, v2_blk):
        s = jax.lax.axis_index(axis_name)
        inf = jnp.asarray(jnp.inf, dtype)

        fwd0 = (jnp.full((n1_loc,), jnp.inf, dtype),
                jnp.full((n1_loc,), jnp.inf, dtype),
                jnp.zeros((n1_loc,), jnp.int32))
        bwd0 = (jnp.full((n2_loc,), jnp.inf, dtype),
                jnp.full((n2_loc,), jnp.inf, dtype),
                jnp.zeros((n2_loc,), jnp.int32))

        def step(t, carry):
            (fb, fs, fi), (bb, bs, bi), blk, vblk = carry
            origin = (s - t) % n_sh          # shard that owns this block
            D = ssd_matrix(d1_blk, blk, dtype)
            D = jnp.where(vblk[None, :], D, inf)
            D = jnp.where(v1_blk[:, None], D, inf)
            li, lb, ls = _top2_min(D, axis=1)
            fwd = _merge_top2(fb, fs, fi, lb, ls,
                              li + origin * n2_loc)
            ti, tb, ts = _top2_min(D, axis=0)
            bwd = _merge_top2(bb, bs, bi, tb, ts,
                              ti + s * n1_loc)
            # The d2 block and its accumulated backward state move on.
            blk = jax.lax.ppermute(blk, axis_name, perm)
            vblk = jax.lax.ppermute(vblk, axis_name, perm)
            bwd = tuple(jax.lax.ppermute(x, axis_name, perm)
                        for x in bwd)
            return fwd, bwd, blk, vblk

        (fb, fs, fi), (bb, bs, bi), _, _ = jax.lax.fori_loop(
            0, n_sh, step, (fwd0, bwd0, d2_blk, v2_blk))
        # After n_sh steps (each ending in a permute) every block - and
        # its backward state - is back at its owner.
        fwd_ok = _ratio_accept(fb, fs, nn_thresh)
        bwd_ok_l = _ratio_accept(bb, bs, nn_thresh)

        bwd_idx = jax.lax.all_gather(bi, axis_name).reshape(n2)
        bwd_ok = jax.lax.all_gather(bwd_ok_l, axis_name).reshape(n2)
        rows = s * n1_loc + jnp.arange(n1_loc, dtype=jnp.int32)
        consistent = (bwd_idx[fi] == rows) & bwd_ok[fi]
        any_v2 = jnp.any(jax.lax.all_gather(jnp.any(v2_blk), axis_name))
        ok = fwd_ok & consistent & v1_blk & any_v2
        out_l = jnp.where(ok, fi, -1).astype(jnp.int32)
        return jax.lax.all_gather(out_l, axis_name).reshape(n1)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name),
                  P(axis_name)),
        out_specs=P(None),
        check_vma=False,   # result is replicated by the final all_gather
    )(d1, d2, valid1, valid2)
