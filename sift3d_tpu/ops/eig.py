"""Batched closed-form symmetric 3x3 eigendecomposition.

Replaces the reference's LAPACK dsyevd call (imutil.c:2992-3075) for the
orientation structure tensor. The trigonometric method gives eigenvalues in
ascending order like dsyevd; eigenvectors are computed by the cross-product
of the two best-conditioned rows of (A - lambda I), which is robust whenever
the eigenvalues are distinct - and SIFT3D rejects near-degenerate tensors
anyway (max_eig_ratio test, sift.c:1440-1444).

Closed form compiles to a handful of VPU ops instead of an iterative
eigensolver, which matters a lot for TPU compile time and throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh3x3(A: jax.Array):
    """Eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns (lam, Q): lam (..., 3) ascending, Q (..., 3, 3) with
    orthonormal eigenvector columns Q[..., :, i].
    """
    dtype = A.dtype
    a00 = A[..., 0, 0]; a01 = A[..., 0, 1]; a02 = A[..., 0, 2]
    a11 = A[..., 1, 1]; a12 = A[..., 1, 2]; a22 = A[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00 = a00 - q; b11 = a11 - q; b22 = a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(p2 / 6.0)
    safe_p = jnp.where(p > 0, p, 1.0)

    # det((A - qI) / p) / 2
    c00 = b00 / safe_p; c01 = a01 / safe_p; c02 = a02 / safe_p
    c11 = b11 / safe_p; c12 = a12 / safe_p; c22 = b22 / safe_p
    detb = (c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_pi_3 = jnp.asarray(2.0943951023931953, dtype)
    lam2 = q + 2.0 * p * jnp.cos(phi)               # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)    # smallest
    lam1 = 3.0 * q - lam2 - lam0
    degenerate = p2 <= 0
    lam0 = jnp.where(degenerate, q, lam0)
    lam1 = jnp.where(degenerate, q, lam1)
    lam2 = jnp.where(degenerate, q, lam2)
    lam = jnp.stack([lam0, lam1, lam2], axis=-1)

    rows = jnp.stack([
        jnp.stack([a00, a01, a02], -1),
        jnp.stack([a01, a11, a12], -1),
        jnp.stack([a02, a12, a22], -1)], -2)        # (..., 3, 3)

    def eigvec(lmbda):
        # rows of (A - lambda I)
        M = rows - lmbda[..., None, None] * jnp.eye(3, dtype=dtype)
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01_ = jnp.cross(r0, r1)
        c02_ = jnp.cross(r0, r2)
        c12_ = jnp.cross(r1, r2)
        n01 = jnp.sum(c01_ * c01_, -1)
        n02 = jnp.sum(c02_ * c02_, -1)
        n12 = jnp.sum(c12_ * c12_, -1)
        best = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
        v = jnp.where((best == 0)[..., None], c01_,
                      jnp.where((best == 1)[..., None], c02_, c12_))
        nrm = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
        return jnp.where(nrm > 0, v / jnp.where(nrm > 0, nrm, 1.0),
                         jnp.zeros_like(v))

    v0 = eigvec(lam0)
    v2 = eigvec(lam2)
    # Middle eigenvector: orthogonal complement - numerically cleanest.
    v1 = jnp.cross(v2, v0)
    n1 = jnp.sqrt(jnp.sum(v1 * v1, -1, keepdims=True))
    v1 = jnp.where(n1 > 0, v1 / jnp.where(n1 > 0, n1, 1.0), v1)

    # Degenerate fallback (all eigenvalues equal): identity basis. These
    # tensors are rejected by the eigenvalue-ratio test downstream.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), rows.shape)
    Q = jnp.stack([v0, v1, v2], axis=-1)
    Q = jnp.where(degenerate[..., None, None], eye, Q)
    return lam, Q
