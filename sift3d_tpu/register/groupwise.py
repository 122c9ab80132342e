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

Distribution: ``groupwise_solve`` runs single-device (vmap over edges);
``groupwise_solve_sharded`` shards the edges over a mesh axis with
shard_map - each shard RANSAC-filters its edges, accumulates their Gram
blocks into a local partial reduced system, the partials are summed with
``lax.psum`` over the axis, and the small dense system is solved
replicated on every shard. This is the distributed normal-equation
reduction pattern (the Schur-style generalization of the reference's
dgelss least-squares solve, imutil/imutil.c:3207-3294): per-chip Gram
accumulation + collective sum + replicated solve.

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
    hi = jax.lax.Precision.HIGHEST      # TPU default truncates f32 to bf16
    Gpp = jnp.matmul(hp.T, hp_u, precision=hi)
    Gqq = jnp.matmul(hq.T, hq_u, precision=hi)
    Gpq = jnp.matmul(hp.T, hq_u, precision=hi)
    return Gpp, Gqq, Gpq


def _accumulate_system(edges_ij, Gpp, Gqq, Gpq, w, num_volumes: int):
    """Scatter per-edge Gram blocks into the reduced normal-equation
    system. Works with *traced* edge indices (required under shard_map,
    where each shard owns different edges) via ``segment_sum``:
    O(E + N^2) work/memory, unlike a one-hot einsum's O(E * N^2).

    Args:
      edges_ij: (E, 2) i32 (traced ok). w: (E,) 0/1 edge weights.
      Gpp/Gqq/Gpq: (E, 4, 4) per-edge blocks (already inlier-weighted).
    Returns (H4 (N-1, N-1, 4, 4), rhs4 (N-1, 4, 3)).
    """
    n1 = num_volumes - 1
    i = edges_ij[:, 0].astype(jnp.int32)
    j = edges_ij[:, 1].astype(jnp.int32)
    ic = jnp.clip(i - 1, 0, n1 - 1)      # masked rows carry zero data,
    jc = jnp.clip(j - 1, 0, n1 - 1)      # so the clipped target is inert

    def seg(data, mask, ids, num):
        d = data * (w * mask.astype(w.dtype))[:, None, None]
        return jax.ops.segment_sum(d, ids, num_segments=num)

    # Diagonal blocks: H[a, a] += Gpp (a = i-1) and += Gqq (a = j-1).
    diag = (seg(Gpp, i > 0, ic, n1) + seg(Gqq, j > 0, jc, n1))
    # Cross blocks: H[i-1, j-1] -= Gpq and H[j-1, i-1] -= Gpq^T.
    cross = seg(-Gpq, (i > 0) & (j > 0), ic * n1 + jc,
                n1 * n1).reshape(n1, n1, 4, 4)
    H4 = cross + cross.transpose(1, 0, 3, 2)
    H4 = H4.at[jnp.arange(n1), jnp.arange(n1)].add(diag)
    # Gauge terms: edges touching volume 0 (A_0 = I) move to the RHS.
    GpqT = jnp.swapaxes(Gpq, -1, -2)
    rhs4 = (seg(GpqT[:, :, :3], (i == 0) & (j > 0), jc, n1) +
            seg(Gpq[:, :, :3], (j == 0) & (i > 0), ic, n1))
    return H4, rhs4


def groupwise_solve(edges_ij: np.ndarray, src_pts: jax.Array,
                    ref_pts: jax.Array, counts: jax.Array,
                    num_volumes: int,
                    ransac_params: RansacParams = RansacParams(),
                    ridge: float = 1e-9) -> GroupwiseResult:
    """Solve for per-volume affines from per-edge padded correspondences.

    Args:
      edges_ij: (E, 2) int volume indices per edge (host or device).
      src_pts, ref_pts: (E, M, 3) padded matched points in mm; row k of
        edge e pairs src_pts[e, k] (in volume edges_ij[e, 0]) with
        ref_pts[e, k] (in volume edges_ij[e, 1]).
      counts: (E,) i32 number of valid correspondences per edge.
      num_volumes: N; volume 0 is the gauge (A_0 = I).

    Returns GroupwiseResult with A[0] = I.
    """
    if not isinstance(edges_ij, jax.core.Tracer):
        e_np = np.asarray(edges_ij)
        if (e_np[:, 0] == e_np[:, 1]).any():
            raise ValueError("self-edge in edges_ij")
    E = len(edges_ij)

    # Per-edge RANSAC for inlier masks (batched over edges).
    res = jax.vmap(lambda s, r, c: find_tform_ransac(s, r, c,
                                                     ransac_params))(
        src_pts, ref_pts, counts)
    inlier = res.inlier_mask.astype(f64())          # (E, M)

    csum, cn = _point_centroid(src_pts, ref_pts, counts)
    c = csum / jnp.maximum(cn, 1.0)
    Gpp, Gqq, Gpq = jax.vmap(_edge_blocks)(src_pts.astype(f64()) - c,
                                           ref_pts.astype(f64()) - c,
                                           inlier)
    H4, rhs4 = _accumulate_system(jnp.asarray(np.asarray(edges_ij)),
                                  Gpp, Gqq, Gpq,
                                  jnp.ones(E, f64()), num_volumes)
    A = _uncenter(_solve_reduced(H4, rhs4, num_volumes, ridge), c)

    edge_ok = res.num_inliers >= RANSAC_MIN_INLIERS
    ok = jnp.all(edge_ok) & jnp.all(jnp.isfinite(A))
    return GroupwiseResult(A=A, edge_inliers=res.num_inliers,
                           edge_ok=edge_ok, ok=ok)


def _solve_reduced(H4, rhs4, num_volumes: int, ridge: float):
    """Replicated dense solve of the reduced system."""
    n_unk = 4 * (num_volumes - 1)
    H = H4.transpose(0, 2, 1, 3).reshape(n_unk, n_unk)
    H = H + ridge * jnp.eye(n_unk, dtype=f64())
    X = jnp.linalg.solve(H, rhs4.reshape(n_unk, 3))
    return jnp.concatenate([
        jnp.eye(3, 4, dtype=f64())[None],
        jnp.swapaxes(X.reshape(num_volumes - 1, 4, 3), -1, -2)])


def _point_centroid(src_pts, ref_pts, counts):
    """Mean of all valid src+ref points: the centering offset for the
    normal equations (Hartley-style conditioning - raw mm coordinates
    ~O(100) square to an H with condition number ~1e6, which loses ~3
    digits of the f32 solve; centering makes the translation block
    near-orthogonal to the linear block). Returns (sum (3,), n ())."""
    valid = (jnp.arange(src_pts.shape[1]) < counts[:, None]).astype(f64())
    s = jnp.einsum("em,emk->k", valid, src_pts.astype(f64()) +
                   ref_pts.astype(f64()))
    return s, 2.0 * jnp.sum(valid)


def _uncenter(A, c):
    """Map the centered-frame solution back: y = L x + (t' + c - L c)."""
    L = A[:, :, :3]
    t = A[:, :, 3] + c[None, :] - jnp.einsum("nij,j->ni", L, c)
    return jnp.concatenate([L, t[:, :, None]], axis=-1)


def groupwise_solve_sharded(edges_ij, src_pts, ref_pts, counts,
                            num_volumes: int, mesh,
                            axis_name: str = "data",
                            ransac_params: RansacParams = RansacParams(),
                            ridge: float = 1e-9) -> GroupwiseResult:
    """Distributed groupwise solve: edges sharded over ``axis_name``.

    Per shard: RANSAC-filter the local edges, accumulate their Gram
    blocks into a local partial (N-1, N-1, 4, 4) system, then ``psum``
    the partials over the mesh axis and solve the reduced dense system
    replicated. Edges are padded to a multiple of the axis size with
    inactive rows (count 0).

    Args match :func:`groupwise_solve` plus the mesh; returns the same
    GroupwiseResult (edge arrays in padded order, trimmed to E).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    E = len(edges_ij)
    n_sh = mesh.shape[axis_name]
    E_pad = -(-E // n_sh) * n_sh
    edges_d = jnp.zeros((E_pad, 2), jnp.int32).at[:E].set(
        jnp.asarray(np.asarray(edges_ij), jnp.int32))
    valid = (jnp.arange(E_pad) < E)
    M = src_pts.shape[1]

    def pad_e(a):
        return jnp.zeros((E_pad,) + a.shape[1:], a.dtype).at[:E].set(a)
    src_p = pad_e(src_pts.astype(f64()))
    ref_p = pad_e(ref_pts.astype(f64()))
    cnt_p = pad_e(counts.astype(jnp.int32))
    del M

    def local(edges_l, src_l, ref_l, cnt_l, val_l):
        res = jax.vmap(lambda s, r, c: find_tform_ransac(
            s, r, c, ransac_params))(src_l, ref_l, cnt_l)
        inlier = res.inlier_mask.astype(f64()) * \
            val_l.astype(f64())[:, None]
        # Centering offset from a psum over all shards' valid points
        # (padded edges carry count 0, so they drop out).
        csum_l, cn_l = _point_centroid(src_l, ref_l,
                                       cnt_l * val_l.astype(cnt_l.dtype))
        c = jax.lax.psum(csum_l, axis_name) / \
            jnp.maximum(jax.lax.psum(cn_l, axis_name), 1.0)
        Gpp, Gqq, Gpq = jax.vmap(_edge_blocks)(src_l.astype(f64()) - c,
                                               ref_l.astype(f64()) - c,
                                               inlier)
        # Padded edges' contributions are zeroed both through the inlier
        # weights and explicitly via the edge weight vector.
        H4_l, rhs4_l = _accumulate_system(edges_l, Gpp, Gqq, Gpq,
                                          val_l.astype(f64()), num_volumes)
        H4 = jax.lax.psum(H4_l, axis_name)
        rhs4 = jax.lax.psum(rhs4_l, axis_name)
        A = _uncenter(_solve_reduced(H4, rhs4, num_volumes, ridge), c)
        inl_g = jax.lax.all_gather(res.num_inliers, axis_name).reshape(-1)
        ok_l = (res.num_inliers >= RANSAC_MIN_INLIERS) | ~val_l
        ok_g = jax.lax.all_gather(ok_l, axis_name).reshape(-1)
        ok = jnp.all(ok_g) & jnp.all(jnp.isfinite(A))
        return A, inl_g, ok_g, ok

    A, inl, eok, ok = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )(edges_d, src_p, ref_p, cnt_p, valid)
    edge_ok = eok[:E] & (inl[:E] >= RANSAC_MIN_INLIERS)
    return GroupwiseResult(A=A, edge_inliers=inl[:E].astype(jnp.int32),
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
    src, ref, cnt = _match_edges(descriptors, jnp.asarray(edges_ij),
                                 units, match_params, ssd_dtype)
    return groupwise_solve(edges_ij, src, ref, cnt,
                           num_volumes=int(descriptors.count.shape[0]),
                           ransac_params=ransac_params)


def _match_edges(descriptors, edges_dev, units, match_params, ssd_dtype):
    """Device-side per-edge matching (vmapped; shards over edges when the
    caller vmaps/shard_maps it). Returns (src, ref, cnt) in mm."""
    from ..config import MatchParams  # noqa: F401 (kept for parity)
    from ..features.match import matches_to_coords, nn_match
    from .pipeline import im2mm

    def one_edge(e):
        d1 = jax.tree.map(lambda x: x[e[0]], descriptors)
        d2 = jax.tree.map(lambda x: x[e[1]], descriptors)
        m = nn_match(d1.vec, d2.vec, match_params.nn_thresh,
                     d1.valid_mask(), d2.valid_mask(), dtype=ssd_dtype)
        s, r, c = matches_to_coords(d1.xyz, d2.xyz, m)
        return im2mm(s, units), im2mm(r, units), c

    return jax.vmap(one_edge)(edges_dev)


def register_groupwise_sharded(descriptors, edges_ij, units, mesh,
                               axis_name: str = "data",
                               match_params=None,
                               ransac_params=RansacParams(),
                               ssd_dtype=jnp.float32) -> GroupwiseResult:
    """Distributed groupwise registration: the edge workload (matching +
    RANSAC + Gram accumulation) shards over ``axis_name``; descriptors
    are replicated; the reduced solve runs replicated after a psum
    (SURVEY §5.8).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..config import MatchParams

    if match_params is None:
        match_params = MatchParams()
    edges_ij = np.asarray(edges_ij)
    E = len(edges_ij)
    n_sh = mesh.shape[axis_name]
    E_pad = -(-E // n_sh) * n_sh
    # Padded edges match volume 0 against itself but are dropped from the
    # solve by groupwise_solve_sharded's validity mask; match cost is the
    # price of the static shape.
    edges_pad = np.zeros((E_pad, 2), np.int32)
    edges_pad[:E] = edges_ij

    def local_match(edges_l, desc_rep):
        return _match_edges(desc_rep, edges_l, units, match_params,
                            ssd_dtype)

    src, ref, cnt = shard_map(
        local_match, mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )(jnp.asarray(edges_pad), descriptors)
    return groupwise_solve_sharded(
        edges_pad[:E], src[:E], ref[:E], cnt[:E],
        num_volumes=int(descriptors.count.shape[0]), mesh=mesh,
        axis_name=axis_name, ransac_params=ransac_params)
