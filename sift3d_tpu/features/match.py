"""Nearest-neighbor descriptor matching.

Reproduces SIFT3D_nn_match / match_desc (reference sift3d/sift.c:2840-2969):

- brute-force SSD over all 768-dim descriptor pairs;
- ratio test: a query's match is rejected when
  ``ssd_best / ssd_second > nn_thresh**2`` (sift.c:2952-2954);
- forward-backward consistency: query i matches target j only if target j's
  best match among the queries is i and also passes the ratio test
  (sift.c:2881-2884).

The reference's per-query scalar loop with early termination
(sift.c:2937-2939) is result-neutral (a partially accumulated SSD is only
ever discarded), so the TPU-native formulation is a single distance matrix
``|a|^2 + |b|^2 - 2 a.b`` on the MXU followed by two top-2 reductions. Ties
resolve to the lowest index in both implementations (strict `<` in the C
scan; first-occurrence argmin here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dtypes import f64


def _top2_min(D: jax.Array, axis: int):
    """(argmin, min, second-min) along ``axis``; second = +inf if size 1."""
    if axis == 0:
        D = D.T
    neg_vals, idx = jax.lax.top_k(-D, min(2, D.shape[-1]))
    best_idx = idx[..., 0].astype(jnp.int32)
    best = -neg_vals[..., 0]
    if D.shape[-1] >= 2:
        second = -neg_vals[..., 1]
    else:
        second = jnp.full_like(best, jnp.inf)
    return best_idx, best, second


def ssd_matrix(d1: jax.Array, d2: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Pairwise SSD matrix (N1, N2) via the MXU form |a|^2+|b|^2-2ab.

    The reference accumulates in float64 (sift.c:2925-2931); pass
    ``dtype=f64()`` for parity testing, float32 for the TPU fast path.
    """
    a = d1.astype(dtype)
    b = d2.astype(dtype)
    g = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype)
    n1 = jnp.sum(a * a, axis=-1)
    n2 = jnp.sum(b * b, axis=-1)
    d = n1[:, None] + n2[None, :] - 2.0 * g
    return jnp.maximum(d, 0)


def _ratio_accept(best: jax.Array, second: jax.Array,
                  nn_thresh: float) -> jax.Array:
    # Reject iff best/second > t^2. Multiplicative form preserves the C
    # edge cases: second == 0 -> 0 > 0 false -> accept (C gets nan ratio,
    # nan > t^2 false); second == inf -> best > inf false -> accept.
    t2 = jnp.asarray(nn_thresh, best.dtype) ** 2
    return ~(best > t2 * second)


def nn_match(d1: jax.Array, d2: jax.Array, nn_thresh: float,
             valid1: jax.Array | None = None,
             valid2: jax.Array | None = None,
             dtype=jnp.float32) -> jax.Array:
    """Match descriptors d1 (N1, 768) against d2 (N2, 768).

    Args:
      d1, d2: float32 descriptor matrices (rows may include padding).
      nn_thresh: ratio-test threshold (reference default 0.8, reg.c:24).
      valid1, valid2: optional bool masks marking real (non-padding) rows.
      dtype: SSD accumulation dtype.

    Returns:
      matches: (N1,) int32 - index into d2 per d1 row, or -1.
    """
    D = ssd_matrix(d1, d2, dtype)
    inf = jnp.asarray(jnp.inf, D.dtype)
    if valid2 is not None:
        D = jnp.where(valid2[None, :], D, inf)
    if valid1 is not None:
        D = jnp.where(valid1[:, None], D, inf)

    fwd_idx, fwd_best, fwd_second = _top2_min(D, axis=1)
    fwd_ok = _ratio_accept(fwd_best, fwd_second, nn_thresh)

    bwd_idx, bwd_best, bwd_second = _top2_min(D, axis=0)
    bwd_ok = _ratio_accept(bwd_best, bwd_second, nn_thresh)

    consistent = (bwd_idx[fwd_idx] ==
                  jnp.arange(d1.shape[0], dtype=jnp.int32)) & bwd_ok[fwd_idx]
    ok = fwd_ok & consistent
    if valid1 is not None:
        ok = ok & valid1
    if valid2 is not None:
        # No real target -> every row of D is +inf; guard the degenerate case.
        ok = ok & jnp.any(valid2)
    return jnp.where(ok, fwd_idx, -1).astype(jnp.int32)


def matches_to_coords(xyz1: jax.Array, xyz2: jax.Array, matches: jax.Array):
    """Compacted match coordinate pairs (SIFT3D_matches_to_Mat_rm,
    sift.c:2784-2826).

    Args:
      xyz1: (N1, 3) d1 coordinates; xyz2: (N2, 3) d2 coordinates.
      matches: (N1,) int32 from nn_match.

    Returns:
      (src_xyz, ref_xyz, count): (N1, 3) f64 padded coordinate matrices in
      d1 row order (rows >= count are zero), and the match count.
    """
    n1 = matches.shape[0]
    sel = matches >= 0
    pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
    count = (pos[-1] + 1).astype(jnp.int32)
    dest = jnp.where(sel, pos, n1)

    def compact(vals):
        buf = jnp.zeros((n1 + 1, 3), f64())
        return buf.at[dest].set(vals.astype(f64()))[:n1]

    src = compact(xyz1)
    ref = compact(xyz2[jnp.where(sel, matches, 0)])
    return src, ref, count
