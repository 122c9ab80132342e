"""Golden tests: matching and RANSAC registration vs the reference oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from sift3d_tpu.dtypes import f64
from sift3d_tpu.features import match as match_mod
from sift3d_tpu.register import find_tform_ransac, register_pair
from sift3d_tpu.register.pipeline import im2mm, mm2im
from sift3d_tpu.config import MatchParams, RansacParams

from tests.conftest import make_blob_volume


def _fake_descriptors(rng, n, planted_pairs=None, dim=768):
    """Random unit-norm descriptor rows resembling real ones."""
    d = rng.random((n, dim)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return d


def test_nn_match_vs_oracle(oracle, rng):
    n1, n2 = 120, 150
    d1 = _fake_descriptors(rng, n1)
    d2 = _fake_descriptors(rng, n2)
    # Plant strong correspondences: rows 0..39 of d1 nearly equal rows
    # 10..49 of d2.
    for i in range(40):
        d2[10 + i] = d1[i] + rng.normal(0, 0.003, 768).astype(np.float32)
        d2[10 + i] /= np.linalg.norm(d2[10 + i])

    coords1 = rng.random((n1, 3)).astype(np.float32) * 50
    coords2 = rng.random((n2, 3)).astype(np.float32) * 50
    rows1 = np.concatenate([coords1, d1], axis=1)
    rows2 = np.concatenate([coords2, d2], axis=1)
    want = oracle.match(rows1, rows2, nn_thresh=0.8)

    got = np.asarray(match_mod.nn_match(
        jnp.asarray(d1), jnp.asarray(d2), 0.8, dtype=f64()))
    assert (want >= 0).sum() >= 35  # planted matches survive
    np.testing.assert_array_equal(got, want)

    # f32 fast path agrees on virtually all matches
    got32 = np.asarray(match_mod.nn_match(
        jnp.asarray(d1), jnp.asarray(d2), 0.8, dtype=jnp.float32))
    assert (got32 != want).mean() < 0.02


def test_nn_match_padding_invariance(rng):
    d1 = _fake_descriptors(rng, 60)
    d2 = _fake_descriptors(rng, 70)
    for i in range(20):
        d2[i + 5] = d1[i] + rng.normal(0, 0.003, 768).astype(np.float32)
        d2[i + 5] /= np.linalg.norm(d2[i + 5])
    base = np.asarray(match_mod.nn_match(
        jnp.asarray(d1), jnp.asarray(d2), 0.8, dtype=f64()))

    pad1 = np.concatenate([d1, np.zeros((17, 768), np.float32)])
    pad2 = np.concatenate([d2, np.zeros((9, 768), np.float32)])
    v1 = jnp.arange(77) < 60
    v2 = jnp.arange(79) < 70
    got = np.asarray(match_mod.nn_match(
        jnp.asarray(pad1), jnp.asarray(pad2), 0.8, valid1=v1, valid2=v2,
        dtype=f64()))
    np.testing.assert_array_equal(got[:60], base)
    assert (got[60:] == -1).all()


def _synthetic_correspondences(rng, n_inliers=60, n_outliers=25,
                               noise=0.08):
    A_true = np.array([[1.02, 0.03, -0.01, 4.0],
                       [-0.02, 0.98, 0.02, -2.5],
                       [0.01, -0.01, 1.05, 1.0]])
    ref = rng.random((n_inliers + n_outliers, 3)) * 100
    src = ref @ A_true[:, :3].T + A_true[:, 3]
    src[:n_inliers] += rng.normal(0, noise, (n_inliers, 3))
    src[n_inliers:] += rng.normal(0, 40.0, (n_outliers, 3))
    perm = rng.permutation(len(ref))
    return src[perm], ref[perm], A_true


def test_ransac_recovers_ground_truth(rng):
    src, ref, A_true = _synthetic_correspondences(rng)
    res = find_tform_ransac(jnp.asarray(src), jnp.asarray(ref),
                            jnp.int32(len(src)), RansacParams())
    assert bool(res.ok)
    A = np.asarray(res.A)
    # The reference's own accuracy contract (Sift3DTest.m:319-324).
    np.testing.assert_allclose(A[:, :3], A_true[:, :3], atol=5e-2)
    np.testing.assert_allclose(A[:, 3], A_true[:, 3], atol=1.0)
    assert int(res.num_inliers) >= 50
    # Healthy geometry: the oversampled batch covers the full num_iter.
    assert int(res.effective_iters) == RansacParams().num_iter


def test_ransac_effective_iters_underflow(rng):
    """Near-coplanar points make most 4-point draws singular; the result
    must report the shortfall instead of silently under-iterating."""
    n = 40
    ref = rng.random((n, 3)) * 100
    ref[:, 2] = 5.0 + rng.normal(0, 1e-12, n)   # coplanar in z
    src = ref + 1.0
    res = find_tform_ransac(jnp.asarray(src), jnp.asarray(ref),
                            jnp.int32(n), RansacParams())
    assert int(res.effective_iters) < RansacParams().num_iter


def test_ransac_vs_oracle(oracle, rng):
    src, ref, A_true = _synthetic_correspondences(rng)
    A_ref = oracle.ransac(src, ref, err_thresh=5.0, num_iter=500, seed=1)
    res = find_tform_ransac(jnp.asarray(src), jnp.asarray(ref),
                            jnp.int32(len(src)), RansacParams())
    A = np.asarray(res.A)
    # Different RNG streams -> different consensus sets; both must agree
    # with the reference's cross-implementation tolerance.
    np.testing.assert_allclose(A[:, :3], A_ref[:, :3], atol=5e-2)
    np.testing.assert_allclose(A[:, 3], A_ref[:, 3], atol=5.0)


def test_ransac_padding_invariance(rng):
    src, ref, _ = _synthetic_correspondences(rng)
    n = len(src)
    res = find_tform_ransac(jnp.asarray(src), jnp.asarray(ref),
                            jnp.int32(n), RansacParams())
    pad = np.full((40, 3), 1e9)
    res_p = find_tform_ransac(jnp.asarray(np.concatenate([src, pad])),
                              jnp.asarray(np.concatenate([ref, pad])),
                              jnp.int32(n), RansacParams())
    np.testing.assert_allclose(np.asarray(res_p.A), np.asarray(res.A),
                               rtol=0, atol=1e-9)


def test_mm_roundtrip():
    pts = jnp.asarray(np.random.default_rng(0).random((10, 3)) * 30)
    units = (0.7, 1.1, 2.3)
    mm = im2mm(pts, units)
    np.testing.assert_allclose(np.asarray(mm),
                               np.asarray(pts) * np.asarray(units))
    # mm2im of the identity-in-mm equals the unit rescaling
    A_mm = jnp.asarray(np.hstack([np.eye(3), np.ones((3, 1))]))
    A_im = np.asarray(mm2im(A_mm, (2.0, 1.0, 0.5), (1.0, 1.0, 1.0)))
    want = np.hstack([np.diag([0.5, 1.0, 2.0]),
                      np.array([[0.5], [1.0], [2.0]])])
    np.testing.assert_allclose(A_im, want)


def test_register_pair_end_to_end():
    """regAnisoTest analog: register a volume against its translated copy."""
    from sift3d_tpu.features.detect import detect_keypoints
    from sift3d_tpu.features.descriptor import extract_descriptors
    from sift3d_tpu.config import SIFT3DParams

    vol = make_blob_volume((48, 48, 48), seed=3)
    shift = (3, -2, 4)  # (z, y, x) voxels
    ref_vol = np.roll(vol, shift, axis=(0, 1, 2))

    params = SIFT3DParams(max_kp_per_level=1024)
    units = (1.0, 1.0, 1.0)

    kp_s, gpyr_s, plan_s = detect_keypoints(jnp.asarray(vol), units, params)
    d_s = extract_descriptors(gpyr_s, kp_s, plan_s, params)
    kp_r, gpyr_r, plan_r = detect_keypoints(jnp.asarray(ref_vol), units,
                                            params)
    d_r = extract_descriptors(gpyr_r, kp_r, plan_r, params)

    res = register_pair(d_s, d_r, units, units, ssd_dtype=f64())
    assert bool(res.ok), "registration found no model"
    A = np.asarray(res.A)
    # src = ref shifted by -shift in xyz: A ~ [I | -(dx,dy,dz)]. Tolerances
    # are the reference's own accuracy contract (Sift3DTest.m:319-324,
    # 349-357): linear part 5e-2, translation 5 voxels. np.roll wraps
    # content at the boundary, so a few matches are slightly off and the
    # refinement absorbs them, exactly like the reference's LS refine.
    np.testing.assert_allclose(A[:, :3], np.eye(3), atol=5e-2)
    want_t = -np.array([shift[2], shift[1], shift[0]], np.float64)
    np.testing.assert_allclose(A[:, 3], want_t, atol=5.0)
    # The median matched delta must still be the exact shift.
    n = int(res.num_matches)
    d = np.asarray(res.match_src)[:n] - np.asarray(res.match_ref)[:n]
    np.testing.assert_allclose(np.median(d, axis=0), want_t, atol=0.51)
