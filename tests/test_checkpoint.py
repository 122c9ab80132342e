"""Checkpoint / resume subsystem."""

import numpy as np
import jax.numpy as jnp

from sift3d_tpu.features.descriptor import Descriptors
from sift3d_tpu.utils.checkpoint import (RegistrationCheckpoint,
                                         load_descriptors, save_descriptors)


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
