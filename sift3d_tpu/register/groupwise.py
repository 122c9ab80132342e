"""Groupwise multi-volume registration.

A new capability with no reference analog (SURVEY §5.8): jointly estimate
one affine per volume, consistent across all pairwise matches, instead of
chaining independent pairwise registrations.

Formulation: given edges (i, j) with matched point pairs (p, q) - p in
volume i, q in volume j, both in mm - find affines {A_i} minimizing

    sum_edges sum_k  | A_i [p_k; 1] - A_j [q_k; 1] |^2

with the gauge fixed by A_0 = I (volume 0 is the reference frame). Each
of the 3 output rows decouples, so the normal equations share one
(4(N-1), 4(N-1)) Gram matrix H with a (4(N-1), 3) right-hand side:

    H[ii] += sum hp hp^T        H[jj] += sum hq hq^T
    H[ij] -= sum hp hq^T        (h* = homogeneous points)
    edges touching volume 0 move their A_0 terms to the RHS.

Distribution: edges are processed independently (vmap / shard over the
"data" mesh axis), each contributing dense per-edge blocks; the blocks are
summed - a psum when sharded - and the small reduced system is solved
replicated. This is the distributed normal-equation reduction pattern:
per-chip Gram accumulation + collective sum + replicated dense solve.

Robustness: each edge is first filtered by the same RANSAC used for
pairwise registration; only inlier correspondences enter the solve.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RANSAC_MIN_INLIERS, RansacParams
from ..dtypes import f64
from .ransac import find_tform_ransac


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GroupwiseResult:
    A: jax.Array            # (N, 3, 4) affines mapping volume i -> frame 0
    edge_inliers: jax.Array  # (E,) i32 inliers per edge
    edge_ok: jax.Array      # (E,) bool - edge had >= 5 inliers
    ok: jax.Array           # () bool - system solvable & all edges usable


def _edge_blocks(src, ref, weights):
    """Per-edge Gram blocks: (Gpp, Gqq, Gpq, n) with h = [pts; 1].

    src plays p (volume i), ref plays q (volume j).
    """
    def homog(x):
        return jnp.concatenate(
            [x, jnp.ones(x.shape[:-1] + (1,), x.dtype)], axis=-1)
    hp = homog(src.astype(f64())) * weights[:, None]
    hq = homog(ref.astype(f64())) * weights[:, None]
    # Unweighted second factor keeps the blocks equal to sum_k w_k h h^T
    # for 0/1 weights.
    hp_u = homog(src.astype(f64()))
    hq_u = homog(ref.astype(f64()))
    Gpp = hp.T @ hp_u
    Gqq = hq.T @ hq_u
    Gpq = hp.T @ hq_u
    return Gpp, Gqq, Gpq


def groupwise_solve(edges_ij: np.ndarray, src_pts: jax.Array,
                    ref_pts: jax.Array, counts: jax.Array,
                    num_volumes: int,
                    ransac_params: RansacParams = RansacParams(),
                    ridge: float = 1e-9) -> GroupwiseResult:
    """Solve for per-volume affines from per-edge padded correspondences.

    Args:
      edges_ij: (E, 2) int static host array - volume indices per edge.
      src_pts, ref_pts: (E, M, 3) padded matched points in mm; row k of
        edge e pairs src_pts[e, k] (in volume edges_ij[e, 0]) with
        ref_pts[e, k] (in volume edges_ij[e, 1]).
      counts: (E,) i32 number of valid correspondences per edge.
      num_volumes: N; volume 0 is the gauge (A_0 = I).

    Returns GroupwiseResult with A[0] = I.
    """
    E = len(edges_ij)
    n_unk = 4 * (num_volumes - 1)

    # Per-edge RANSAC for inlier masks (batched over edges).
    res = jax.vmap(lambda s, r, c: find_tform_ransac(s, r, c,
                                                     ransac_params))(
        src_pts, ref_pts, counts)
    inlier = res.inlier_mask.astype(f64())          # (E, M)

    Gpp, Gqq, Gpq = jax.vmap(_edge_blocks)(src_pts, ref_pts, inlier)

    H = jnp.zeros((n_unk, n_unk), f64())
    rhs = jnp.zeros((n_unk, 3), f64())

    def unk_slice(i):
        return 4 * (i - 1)

    # Static scatter of edge blocks (edges_ij is a host array, so this
    # unrolls; E is small compared to the matching work).
    for e, (i, j) in enumerate(np.asarray(edges_ij)):
        i, j = int(i), int(j)
        if i == j:
            raise ValueError(f"self-edge {i}")
        if i > 0:
            oi = unk_slice(i)
            H = H.at[oi:oi + 4, oi:oi + 4].add(Gpp[e])
        if j > 0:
            oj = unk_slice(j)
            H = H.at[oj:oj + 4, oj:oj + 4].add(Gqq[e])
        if i > 0 and j > 0:
            oi, oj = unk_slice(i), unk_slice(j)
            H = H.at[oi:oi + 4, oj:oj + 4].add(-Gpq[e])
            H = H.at[oj:oj + 4, oi:oi + 4].add(-Gpq[e].T)
        # Gauge terms: A_0 = I contributes to the RHS.
        if i == 0 and j > 0:
            # residual: I hp - A_j hq -> normal eq: Gqq A_j^T = Gpq^T I^T
            oj = unk_slice(j)
            rhs = rhs.at[oj:oj + 4, :].add(Gpq[e].T[:, :3])
        if j == 0 and i > 0:
            oi = unk_slice(i)
            rhs = rhs.at[oi:oi + 4, :].add(Gpq[e][:, :3])

    H = H + ridge * jnp.eye(n_unk, dtype=f64())
    X = jnp.linalg.solve(H, rhs)                    # (4(N-1), 3)
    A = jnp.concatenate([
        jnp.eye(3, 4, dtype=f64())[None],
        jnp.swapaxes(X.reshape(num_volumes - 1, 4, 3), -1, -2)])

    edge_ok = res.num_inliers >= RANSAC_MIN_INLIERS
    ok = jnp.all(edge_ok) & jnp.all(jnp.isfinite(A))
    return GroupwiseResult(A=A, edge_inliers=res.num_inliers,
                           edge_ok=edge_ok, ok=ok)


def register_groupwise(descriptors, edges_ij, units,
                       match_params=None, ransac_params=RansacParams(),
                       ssd_dtype=jnp.float32) -> GroupwiseResult:
    """Groupwise registration from per-volume descriptor sets.

    Args:
      descriptors: Descriptors pytree with leading volume axis (N, ...),
        e.g. from parallel.pipeline.batch_detect_describe.
      edges_ij: (E, 2) host int array of volume index pairs to match.
      units: shared (ux, uy, uz) of all volumes.

    Matching runs per edge (vmap -> shards over "data" under jit); the
    reduced system solves replicated.
    """
    from ..config import MatchParams
    from ..features.match import matches_to_coords, nn_match
    from .pipeline import im2mm

    if match_params is None:
        match_params = MatchParams()
    edges_ij = np.asarray(edges_ij)

    def one_edge(e):
        i, j = int(e[0]), int(e[1])
        d1 = jax.tree.map(lambda x: x[i], descriptors)
        d2 = jax.tree.map(lambda x: x[j], descriptors)
        m = nn_match(d1.vec, d2.vec, match_params.nn_thresh,
                     d1.valid_mask(), d2.valid_mask(), dtype=ssd_dtype)
        s, r, c = matches_to_coords(d1.xyz, d2.xyz, m)
        return im2mm(s, units), im2mm(r, units), c

    outs = [one_edge(e) for e in edges_ij]
    src = jnp.stack([o[0] for o in outs])
    ref = jnp.stack([o[1] for o in outs])
    cnt = jnp.stack([o[2] for o in outs])
    return groupwise_solve(edges_ij, src, ref, cnt,
                           num_volumes=int(descriptors.count.shape[0]),
                           ransac_params=ransac_params)
