"""Vectorized RANSAC affine fitting.

Reproduces find_tform_ransac / ransac / solve_system (reference
imutil/imutil.c:4619-4882, 4490-4572):

- the affine A (3x4) maps *ref* points to *src* points: the fitted system is
  ``[ref | 1] @ X = src`` with ``A = X^T`` (make_affine_matrix
  imutil.c:4430-4455, solve_system imutil.c:4519-4521);
- each hypothesis draws dim+1 = 4 correspondences and solves the square
  system exactly; a draw is "singular" when the 1-norm reciprocal condition
  falls below 100*DBL_EPSILON (solve_Mat_rm's dgecon check,
  imutil.c:3089-3195) and is retried (imutil.c:4801-4803);
- consensus = points with squared error <= err_thresh^2, where the error
  applies the transform to the ref point and compares against src
  (tform_err_sq, imutil.c:4575-4605);
- the best (strictly larger, first-wins) consensus set over num_iter
  non-singular iterations is refined by least squares (SIFT3D_RANSAC_REFINE,
  imutil.c:4840-4858), keeping the unrefined transform if refinement is
  singular; at least 5 inliers are required (imutil.c:4787).

TPU-native differences: the sequential retry loop becomes an oversampled
batch of hypotheses filtered to the first num_iter non-singular ones, and
the C `rand()` Knuth shuffle (n_choose_k, imutil.c:4286-4326) becomes
counter-based `jax.random` draws *with* replacement - a duplicate index
makes the 4-point system singular, which the validity mask already rejects.
Parity with the reference is therefore judged on transform error, the same
contract its own tests use (Sift3DTest.m:319-324).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import RANSAC_MIN_INLIERS, SINGULAR_RCOND, RansacParams
from ..dtypes import f64


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RansacResult:
    A: jax.Array            # (3, 4) affine, ref -> src
    num_inliers: jax.Array  # () i32
    inlier_mask: jax.Array  # (N,) bool over the padded match rows
    ok: jax.Array           # () bool - >= 5 inliers found
    effective_iters: jax.Array  # () i32 non-singular hypotheses actually run


def _homogeneous(pts: jax.Array) -> jax.Array:
    """[pts | 1] (..., n, 4)."""
    return jnp.concatenate(
        [pts, jnp.ones(pts.shape[:-1] + (1,), pts.dtype)], axis=-1)


def _rcond_1norm(M: jax.Array) -> jax.Array:
    """Exact 1-norm reciprocal condition number of batched square matrices.

    LAPACK dgecon estimates this quantity; for 4x4 systems the exact value
    is cheap. Near-threshold disagreements only change which singular draws
    get redrawn, not the contract.
    """
    norm1 = jnp.max(jnp.sum(jnp.abs(M), axis=-2), axis=-1)
    inv = jnp.linalg.inv(M)
    inv_norm1 = jnp.max(jnp.sum(jnp.abs(inv), axis=-2), axis=-1)
    r = 1.0 / (norm1 * inv_norm1)
    return jnp.where(jnp.isfinite(r), r, 0.0)


def fit_affine_exact(src4: jax.Array, ref4: jax.Array):
    """Exact affine from 4 correspondences. Returns (A (...,3,4), rcond)."""
    B = _homogeneous(ref4)                       # (..., 4, 4)
    rcond = _rcond_1norm(B)
    safe = jnp.where((rcond > 0)[..., None, None], B,
                     jnp.eye(4, dtype=B.dtype))
    X = jnp.linalg.solve(safe, src4)             # (..., 4, 3)
    A = jnp.swapaxes(X, -1, -2)                  # (..., 3, 4)
    return A, rcond


def fit_affine_ls(src: jax.Array, ref: jax.Array, weights: jax.Array):
    """Weighted least-squares affine (solve_Mat_rm_ls, imutil.c:3207-3294).

    Zero-weight rows drop out of the normal equations, so the masked padded
    system equals the reference's compacted dgelss solve up to conditioning.

    Returns (A (3,4), ok bool).
    """
    B = _homogeneous(ref.astype(f64()))          # (N, 4)
    w = weights.astype(f64())[:, None]
    Bw = B * w
    hi = jax.lax.Precision.HIGHEST               # f64() may be f32 (x64 off);
    G = jnp.matmul(B.T, Bw, precision=hi)        # TPU default would truncate
    rhs = jnp.matmul(Bw.T, src.astype(f64()), precision=hi)
    rcond = _rcond_1norm(G)
    ok = rcond > SINGULAR_RCOND ** 2             # G squares the conditioning
    safe = jnp.where(ok, G, jnp.eye(4, dtype=G.dtype))
    X = jnp.linalg.solve(safe, rhs)
    A = X.T
    ok = ok & jnp.all(jnp.isfinite(A))
    return A, ok


def tform_err_sq(A: jax.Array, src: jax.Array, ref: jax.Array) -> jax.Array:
    """Squared residual per point: |src - A [ref;1]|^2 (imutil.c:4575-4605)."""
    out = jnp.matmul(_homogeneous(ref), jnp.swapaxes(A, -1, -2),
                     precision=jax.lax.Precision.HIGHEST)   # (..., N, 3)
    d = src - out
    return jnp.sum(d * d, axis=-1)


@functools.partial(jax.jit, static_argnames=("params",))
def find_tform_ransac(src: jax.Array, ref: jax.Array, count: jax.Array,
                      params: RansacParams = RansacParams()) -> RansacResult:
    """RANSAC affine fit on padded correspondence arrays.

    Args:
      src, ref: (N, 3) f64 padded point matrices (same physical units);
        rows >= count are padding.
      count: () i32 number of valid correspondences.
      params: RansacParams (static).

    Returns RansacResult; A maps ref -> src like the reference.
    """
    src = src.astype(f64())
    ref = ref.astype(f64())
    n_cap = src.shape[0]
    n_hyp = params.num_iter * params.oversample
    key = jax.random.PRNGKey(params.seed)

    # 4 draws per hypothesis, uniform over the valid rows (with replacement;
    # duplicates produce singular systems and are filtered below).
    u = jax.random.uniform(key, (n_hyp, 4), f64())
    idx = jnp.minimum((u * count.astype(f64())).astype(jnp.int32),
                      jnp.maximum(count - 1, 0))

    src4 = src[idx]                              # (H, 4, 3)
    ref4 = ref[idx]
    A_h, rcond = fit_affine_exact(src4, ref4)
    nonsingular = (rcond > SINGULAR_RCOND) & \
        jnp.all(jnp.isfinite(A_h), axis=(-2, -1))

    # Keep only the first num_iter non-singular hypotheses, emulating the
    # reference's retry-until-nonsingular loop with a fixed iteration count.
    # ``effective_iters`` reports how many actually ran: on degenerate
    # geometry (near-coplanar keypoints) more than half the oversampled
    # draws can be singular, silently leaving < num_iter iterations -
    # callers can inspect the shortfall instead of trusting num_iter.
    rank = jnp.cumsum(nonsingular.astype(jnp.int32)) - 1
    active = nonsingular & (rank < params.num_iter)
    effective_iters = jnp.sum(active.astype(jnp.int32))

    valid_pt = jnp.arange(n_cap) < count
    # Batched consensus: (H, N) errors.
    out = jnp.einsum("hij,nj->hni", A_h[..., :3], ref,
                     precision=jax.lax.Precision.HIGHEST) \
        + A_h[..., None, :, 3]
    d = src[None, :, :] - out
    err2 = jnp.sum(d * d, axis=-1)
    thresh2 = jnp.asarray(params.err_thresh, f64()) ** 2
    inliers = (err2 <= thresh2) & valid_pt[None, :]
    counts = jnp.where(active, jnp.sum(inliers, axis=-1), -1)

    best = jnp.argmax(counts)                    # first max (strict > in C)
    len_best = counts[best]
    A_best = A_h[best]
    best_mask = inliers[best]

    ok = len_best >= RANSAC_MIN_INLIERS

    # Least-squares refinement on the best consensus set.
    A_ref, ref_ok = fit_affine_ls(src, ref, best_mask.astype(f64()))
    A_final = jnp.where(ref_ok, A_ref, A_best)

    return RansacResult(A=A_final,
                        num_inliers=len_best.astype(jnp.int32),
                        inlier_mask=best_mask, ok=ok,
                        effective_iters=effective_iters)
