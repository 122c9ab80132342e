"""Checkpoint / resume subsystem."""

import numpy as np
import jax.numpy as jnp

from sift3d_tpu.features.descriptor import Descriptors
from sift3d_tpu.features.keypoints import Keypoints
from sift3d_tpu.utils.checkpoint import (RegistrationCheckpoint,
                                         load_descriptors, load_keypoints,
                                         save_descriptors, save_keypoints)


def test_descriptor_roundtrip(tmp_path, rng):
    n, cap = 17, 32
    d = Descriptors(
        xyz=jnp.asarray(rng.random((cap, 3))),
        sd=jnp.asarray(rng.random(cap)),
        vec=jnp.asarray(rng.random((cap, 768)).astype(np.float32)),
        count=jnp.int32(n))
    path = str(tmp_path / "d.npz")
    save_descriptors(path, d)
    back = load_descriptors(path, capacity=cap)
    assert int(back.count) == n
    np.testing.assert_allclose(np.asarray(back.vec)[:n],
                               np.asarray(d.vec)[:n])
    assert (np.asarray(back.vec)[n:] == 0).all()


def test_keypoint_roundtrip(tmp_path, rng):
    n, cap = 9, 16
    R = np.tile(np.eye(3, dtype=np.float32), (cap, 1, 1))
    kp = Keypoints(
        x=jnp.asarray(rng.random(cap)), y=jnp.asarray(rng.random(cap)),
        z=jnp.asarray(rng.random(cap)),
        o=jnp.asarray(rng.integers(0, 3, cap).astype(np.int32)),
        s=jnp.asarray(rng.integers(0, 3, cap).astype(np.int32)),
        sd=jnp.asarray(rng.random(cap)), R=jnp.asarray(R),
        count=jnp.int32(n))
    path = str(tmp_path / "kp.npz")
    save_keypoints(path, kp)
    back = load_keypoints(path, capacity=cap)
    assert int(back.count) == n
    for field in ("x", "y", "z", "sd"):
        np.testing.assert_allclose(np.asarray(getattr(back, field))[:n],
                                   np.asarray(getattr(kp, field))[:n],
                                   rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.o)[:n],
                                  np.asarray(kp.o)[:n])
    np.testing.assert_array_equal(np.asarray(back.s)[:n],
                                  np.asarray(kp.s)[:n])
    np.testing.assert_allclose(np.asarray(back.R)[:n],
                               np.asarray(kp.R)[:n])
    assert (np.asarray(back.x)[n:] == 0).all()


def test_registration_checkpoint_resume(tmp_path, rng):
    ckpt = RegistrationCheckpoint(str(tmp_path / "ck"))
    A = rng.random((3, 4))
    assert not ckpt.has((0, 1))
    ckpt.put((0, 1), A, num_inliers=12)
    assert ckpt.has((0, 1))
    A2, inl, ok = ckpt.get((0, 1))
    np.testing.assert_allclose(A2, A)
    assert inl == 12 and ok
    # Resume semantics: a second pass skips completed pairs.
    done = [k for k in ckpt.keys()]
    assert done == ["0_1"]
    pairs = [(0, 1), (1, 2)]
    todo = [p for p in pairs if not ckpt.has(p)]
    assert todo == [(1, 2)]
