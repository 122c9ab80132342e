"""Golden tests: dense descriptors and warping vs the reference oracle."""

import numpy as np
import jax.numpy as jnp

from sift3d_tpu.config import SIFT3DParams
from sift3d_tpu.features.dense import extract_dense_descriptors
from sift3d_tpu.ops.interp import im_inv_transform, im_resample

from tests.conftest import make_blob_volume


def test_dense_vs_oracle(oracle):
    vol = make_blob_volume((24, 20, 28), seed=11)
    want = oracle.dense(vol)
    got = np.asarray(extract_dense_descriptors(jnp.asarray(vol)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_dense_aniso_vs_oracle(oracle):
    vol = make_blob_volume((16, 24, 20), seed=12)
    units = (1.0, 1.3, 2.0)
    want = oracle.dense(vol, units)
    got = np.asarray(extract_dense_descriptors(jnp.asarray(vol), units))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_dense_rotate_vs_oracle(oracle):
    """Rotation-invariant dense path (dense_rotate=True) vs the oracle
    (reference extract_dense_descriptors_rotate, sift.c:2521-2588)."""
    vol = make_blob_volume((14, 12, 16), seed=14)
    oracle.set_dense_rotate(True)
    try:
        want = oracle.dense(vol)
    finally:
        oracle.set_dense_rotate(False)
    got = np.asarray(extract_dense_descriptors(
        jnp.asarray(vol), params=SIFT3DParams(dense_rotate=True)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def _random_affine(rng):
    A = np.eye(3) + rng.normal(0, 0.05, (3, 3))
    t = rng.normal(0, 2.0, (3, 1))
    return np.hstack([A, t])


def test_inv_transform_linear_vs_oracle(oracle, rng):
    vol = make_blob_volume((20, 24, 22), seed=13)
    A = _random_affine(rng)
    want = oracle.inv_transform(vol, A, "linear")
    got = np.asarray(im_inv_transform(jnp.asarray(A), jnp.asarray(vol),
                                      interp="linear"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inv_transform_lanczos_vs_oracle(oracle, rng):
    vol = make_blob_volume((18, 20, 16), seed=14)
    A = _random_affine(rng)
    want = oracle.inv_transform(vol, A, "lanczos2")
    got = np.asarray(im_inv_transform(jnp.asarray(A), jnp.asarray(vol),
                                      interp="lanczos2"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inv_transform_identity():
    vol = make_blob_volume((12, 12, 12), seed=15)
    A = np.hstack([np.eye(3), np.zeros((3, 1))])
    got = np.asarray(im_inv_transform(jnp.asarray(A), jnp.asarray(vol)))
    np.testing.assert_allclose(got, vol, atol=1e-6)


def test_im_resample_shapes():
    vol = make_blob_volume((16, 16, 16), seed=16)
    out = im_resample(jnp.asarray(vol), (1.0, 1.0, 2.0), (1.0, 1.0, 1.0))
    assert out.shape == (32, 16, 16)
    # Downsample back loses only interpolation error in the interior.
    back = im_resample(out, (1.0, 1.0, 1.0), (1.0, 1.0, 2.0))
    assert back.shape == (16, 16, 16)
    np.testing.assert_allclose(np.asarray(back)[1:-1], vol[1:-1], atol=0.05)


def test_dense_channel_seq_matches_default(rng, monkeypatch):
    """The memory-lean channel-sequential dense path (used above
    DENSE_CHANNEL_SEQ_VOX, e.g. the 512^3 config-3 bench) equals the
    all-at-once splat path."""
    from sift3d_tpu.features import dense as dense_mod
    from sift3d_tpu.config import SIFT3DParams

    vol = make_blob_volume((18, 16, 20), seed=31)
    units = (1.0, 1.3, 0.8)
    want = np.asarray(dense_mod.extract_dense_descriptors(
        jnp.asarray(vol), units, SIFT3DParams()))
    monkeypatch.setattr(dense_mod, "DENSE_CHANNEL_SEQ_VOX", 1)
    got = np.asarray(dense_mod.extract_dense_descriptors(
        jnp.asarray(vol), units, SIFT3DParams()))
    np.testing.assert_allclose(got, want, atol=2e-5)
