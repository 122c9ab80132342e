"""TPS transforms and sharded matching."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift3d_tpu.register.tps import (Tps, fit_tps, tps_apply,
                                     im_inv_transform_tps)
from sift3d_tpu.parallel import make_mesh
from sift3d_tpu.parallel.shard_match import nn_match_sharded
from sift3d_tpu.features.match import nn_match


def test_tps_fit_interpolates(rng):
    ctrl = rng.random((20, 3)) * 50
    targets = ctrl + rng.normal(0, 3.0, (20, 3))
    tps = fit_tps(ctrl, targets)
    got = np.asarray(tps_apply(tps, jnp.asarray(ctrl)))
    np.testing.assert_allclose(got, targets, atol=1e-3)


def test_tps_reduces_to_affine(rng):
    """Fitting TPS to exactly affine data recovers the affine map."""
    A = np.array([[1.1, 0.02, 0.0, 3.0],
                  [0.0, 0.95, 0.05, -2.0],
                  [0.01, 0.0, 1.0, 1.0]])
    ctrl = rng.random((30, 3)) * 40
    targets = ctrl @ A[:, :3].T + A[:, 3]
    tps = fit_tps(ctrl, targets)
    test_pts = rng.random((15, 3)) * 40
    got = np.asarray(tps_apply(tps, jnp.asarray(test_pts)))
    want = test_pts @ A[:, :3].T + A[:, 3]
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_tps_apply_matches_reference_formula(rng):
    """Hand-evaluate the reference's apply_Tps_xyz sum for one point."""
    n = 6
    ctrl = rng.random((n, 3)) * 10
    params = rng.random((3, n + 4))
    tps = Tps(params=jnp.asarray(params), ctrl=jnp.asarray(ctrl))
    p = rng.random(3) * 10
    r_sq = ((p - ctrl) ** 2).sum(1)
    U = np.where(r_sq > 0, r_sq * np.log(r_sq), 0.0)
    want = (params[:, :n] @ U + params[:, n]
            + params[:, n + 1:] @ p)
    got = np.asarray(tps_apply(tps, jnp.asarray(p)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tps_warp_shapes(rng):
    ctrl = rng.random((10, 3)) * 10
    tps = fit_tps(ctrl, ctrl)   # identity-ish
    vol = rng.random((12, 12, 12)).astype(np.float32)
    out = np.asarray(im_inv_transform_tps(tps, jnp.asarray(vol)))
    assert out.shape == (12, 12, 12)
    # interior should be close to the original for the identity fit
    np.testing.assert_allclose(out[2:-2, 2:-2, 2:-2],
                               vol[2:-2, 2:-2, 2:-2], atol=0.05)


def _descriptors(rng, n):
    d = rng.random((n, 768)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def test_nn_match_sharded_matches_local(rng):
    d1 = _descriptors(rng, 96)
    d2 = _descriptors(rng, 128)
    for i in range(30):
        d2[i + 7] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i + 7] /= np.linalg.norm(d2[i + 7])
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8))
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    got = np.asarray(nn_match_sharded(jnp.asarray(d1), jnp.asarray(d2),
                                      0.8, mesh))
    np.testing.assert_array_equal(got, want)


def test_nn_match_sharded_with_padding(rng):
    d1 = _descriptors(rng, 64)
    d2 = _descriptors(rng, 96)
    for i in range(20):
        d2[i] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i] /= np.linalg.norm(d2[i])
    v1 = jnp.arange(64) < 50
    v2 = jnp.arange(96) < 80
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8,
                               valid1=v1, valid2=v2))
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    got = np.asarray(nn_match_sharded(jnp.asarray(d1), jnp.asarray(d2),
                                      0.8, mesh, valid1=v1, valid2=v2))
    np.testing.assert_array_equal(got, want)


def test_nn_match_sharded_streamed(rng):
    """Sharded matcher with the Pallas streaming local reduce (interpret
    mode off-TPU) equals the single-device XLA matcher."""
    d1 = _descriptors(rng, 96)
    d2 = _descriptors(rng, 128)
    for i in range(30):
        d2[i + 7] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i + 7] /= np.linalg.norm(d2[i + 7])
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8))
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    got = np.asarray(nn_match_sharded(jnp.asarray(d1), jnp.asarray(d2),
                                      0.8, mesh, streamed=True))
    np.testing.assert_array_equal(got, want)


def test_nn_match_ring_matches_local(rng):
    """Ring-pass matcher (both sides sharded, ppermute rotation) equals
    the single-device matcher."""
    from sift3d_tpu.parallel.shard_match import nn_match_ring

    d1 = _descriptors(rng, 96)
    d2 = _descriptors(rng, 128)
    for i in range(30):
        d2[i + 7] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i + 7] /= np.linalg.norm(d2[i + 7])
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8))
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    got = np.asarray(nn_match_ring(jnp.asarray(d1), jnp.asarray(d2),
                                   0.8, mesh))
    np.testing.assert_array_equal(got, want)


def test_nn_match_ring_with_padding(rng):
    from sift3d_tpu.parallel.shard_match import nn_match_ring

    d1 = _descriptors(rng, 64)
    d2 = _descriptors(rng, 96)
    for i in range(20):
        d2[i] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i] /= np.linalg.norm(d2[i])
    v1 = jnp.arange(64) < 50
    v2 = jnp.arange(96) < 80
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8,
                               valid1=v1, valid2=v2))
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    got = np.asarray(nn_match_ring(jnp.asarray(d1), jnp.asarray(d2),
                                   0.8, mesh, valid1=v1, valid2=v2))
    np.testing.assert_array_equal(got, want)


def test_register_pair_tps_recovers_translation():
    """TPS registration on a pure shift: the fitted spline must map ref
    points onto src points (~translation by -3 in x) across the volume."""
    from sift3d_tpu.api import RegSift3D
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.register.tps import tps_apply
    from tests.conftest import make_blob_volume

    src = make_blob_volume((48, 48, 48), seed=17)
    ref = np.roll(src, 3, axis=2)
    reg = RegSift3D(SIFT3DParams(max_kp_per_level=1024))
    result, tps = reg.register_tps(src, ref)
    assert tps is not None and result.ok
    # Deep-interior probe grid (mm == voxels at unit spacing): near the
    # boundary the spline extrapolates beyond the control-point hull.
    g = np.stack(np.meshgrid(*[np.arange(18, 31, 6)] * 3,
                             indexing="ij"), -1).reshape(-1, 3).astype(float)
    mapped = np.asarray(tps_apply(tps, jnp.asarray(g)))
    want = g + np.array([-3.0, 0.0, 0.0])
    np.testing.assert_allclose(mapped, want, atol=1.5)


def test_tps_cli_roundtrip(tmp_path):
    """--type tps writes a TPS transform CSV that round-trips, and a
    warped volume close to the reference image."""
    from sift3d_tpu.cli.reg import main as reg_main
    from sift3d_tpu.io import im_write, im_read
    from sift3d_tpu.io.csv import read_tps
    from sift3d_tpu.io.volume import Volume
    from tests.conftest import make_blob_volume

    src = make_blob_volume((32, 32, 32), seed=23)
    ref = np.roll(src, 2, axis=2)
    sp, rp = str(tmp_path / "s.nii"), str(tmp_path / "r.nii")
    im_write(sp, Volume(src))
    im_write(rp, Volume(ref))
    tcsv = str(tmp_path / "t.csv")
    wout = str(tmp_path / "w.nii")
    rc = reg_main([sp, rp, "--type", "tps", "--transform", tcsv,
                   "--warped", wout])
    assert rc == 0
    params, ctrl = read_tps(tcsv)
    assert params.shape[0] == 3 and params.shape[1] == len(ctrl) + 4
    back = im_read(wout).data
    if back.ndim == 4:
        back = back[..., 0]
    inner = (slice(6, -6),) * 3
    err = np.abs(back[inner] - ref[inner]).mean()
    # 32^3 is feature-sparse; spline extrapolation away from the few
    # control points bounds the mean warp error near ~0.05.
    assert err < 0.08, err
