"""Synthetic bench volumes shared by bench.py and the gate calibration.

Ellipsoidal (anisotropic) Gaussian blobs, positive amplitudes. Isotropic
blobs are nearly useless for SIFT3D benchmarks: the detector's corner
test (min |cos(eigvec, window grad)|, reference sift3d/sift.c:1464-1465)
rejects spherically-symmetric structures, so volumes built from isotropic
blobs yield single-digit keypoint counts and RANSAC routinely finds no
model at all - for the C reference as much as for this build (measured
round 3: 3-39 keypoints, most pairs unregistrable by either). Randomly
oriented ellipsoids with axis ratios up to `aniso` give ~60-120 keypoints
per 64^3 volume and ~1-voxel registration errors for both implementations.
"""

from __future__ import annotations

import numpy as np

SHIFT = 3   # voxels along x; ground truth A = [I | (-SHIFT, 0, 0)]


def make_volume(shape_zyx, nblob=60, seed=0, aniso=2.0,
                sig_lo=1.5, sig_hi=4.0, amp_lo=0.3) -> np.ndarray:
    """One blob volume (float32, zyx). Each blob is evaluated only in a
    +-5*sigma_max bounding box, so generation is O(nblob * box) instead
    of O(nblob * volume) - the difference between seconds and tens of
    minutes at 512^3."""
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape_zyx
    vol = np.zeros(shape_zyx)
    for _ in range(nblob):
        c = np.array([rng.uniform(4, n - 4) for n in shape_zyx])
        Q = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        sig = np.empty(3)
        sig[0] = rng.uniform(sig_lo, sig_hi)
        sig[1:] = sig[0] * rng.uniform(1.0, aniso, 2)
        Sinv = Q @ np.diag(1.0 / sig ** 2) @ Q.T
        r = 5.0 * sig.max()
        lo = np.maximum(np.floor(c - r).astype(int), 0)
        hi = np.minimum(np.ceil(c + r).astype(int) + 1, shape_zyx)
        z, y, x = np.meshgrid(np.arange(lo[0], hi[0]),
                              np.arange(lo[1], hi[1]),
                              np.arange(lo[2], hi[2]), indexing="ij")
        d = np.stack([z, y, x], -1).astype(np.float64) - c
        q = np.einsum("...i,ij,...j->...", d, Sinv, d)
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] += \
            rng.uniform(amp_lo, 1.0) * np.exp(-0.5 * q)
    return vol.astype(np.float32)


def make_pairs(batch, shape_zyx, nblob=60, seed=11):
    """(src, ref) stacks of `batch` pairs; ref = src rolled by SHIFT in x."""
    src = np.stack([make_volume(shape_zyx, nblob, seed=seed + 1000 * b)
                    for b in range(batch)])
    ref = np.roll(src, SHIFT, axis=3)   # ref(x) = src(x - SHIFT)
    return src, ref


def pair_ok(A, shift=SHIFT, t_tol=5.0, lin_tol=5e-2):
    """The reference's own accuracy contract, applied per pair: affine
    linear part within 5e-2 elementwise and translation within 5 voxels
    per element (wrappers/matlab/Sift3DTest.m:319-324)."""
    A = np.asarray(A)
    t = A[..., :, 3] - np.array([-shift, 0.0, 0.0])
    lin = A[..., :, :3] - np.eye(3)
    return (np.abs(t).max(axis=-1) < t_tol) & \
        (np.abs(lin).max(axis=(-1, -2)) < lin_tol)


def make_fleet(n_vol=256, n_pts=24, n_out=3, noise=0.02, seed=5):
    """Config-5-shaped synthetic fleet: n_vol volumes linked by star +
    loop edges (2*n_vol - 2 edges), each edge carrying n_pts true
    correspondences under random near-rigid affines plus n_out gross
    outliers (RANSAC fodder). Returns (edges, src, ref, counts, A_true)
    with A_true[i] the ground-truth affine mapping volume i into volume
    0's frame (the groupwise gauge)."""
    rng = np.random.default_rng(seed)
    tforms = [(np.eye(3), np.zeros(3))]
    for _ in range(1, n_vol):
        R = np.eye(3) + rng.normal(0, 0.02, (3, 3))
        t = rng.normal(0, 4.0, 3)
        tforms.append((R, t))

    def into(i, w):
        R, t = tforms[i]
        return w @ R.T + t

    def true_A(i):
        R, t = tforms[i]
        Ri = np.linalg.inv(R)
        return np.hstack([Ri, -(Ri @ t)[:, None]])

    star = [(0, i) for i in range(1, n_vol)]
    loop = [(i, i + 1) for i in range(1, n_vol - 1)] + [(n_vol - 1, 0)]
    edges = np.array(star + loop)
    M = n_pts + n_out
    src = np.zeros((len(edges), M, 3))
    ref = np.zeros((len(edges), M, 3))
    for e, (i, j) in enumerate(edges):
        w = rng.random((n_pts, 3)) * 100
        src[e, :n_pts] = into(i, w) + rng.normal(0, noise, (n_pts, 3))
        ref[e, :n_pts] = into(j, w) + rng.normal(0, noise, (n_pts, 3))
        src[e, n_pts:] = rng.random((n_out, 3)) * 100
        ref[e, n_pts:] = rng.random((n_out, 3)) * 100
    counts = np.full(len(edges), M, np.int32)
    return edges, src, ref, counts, [true_A(i) for i in range(n_vol)]
