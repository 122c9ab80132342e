"""Pallas streaming matcher vs the XLA matcher (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sift3d_tpu.features.match import nn_match
from sift3d_tpu.ops.pallas_match import nn_match_streamed


def _descriptors(rng, n):
    d = rng.random((n, 768)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def test_streamed_matches_xla(rng):
    d1 = _descriptors(rng, 96)
    d2 = _descriptors(rng, 256)
    for i in range(40):
        d2[i + 9] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i + 9] /= np.linalg.norm(d2[i + 9])
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8))
    got = np.asarray(nn_match_streamed(jnp.asarray(d1), jnp.asarray(d2),
                                       0.8, block1=32, block2=64, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_streamed_with_padding(rng):
    d1 = _descriptors(rng, 64)
    d2 = _descriptors(rng, 128)
    for i in range(20):
        d2[i] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i] /= np.linalg.norm(d2[i])
    v1 = jnp.arange(64) < 50
    v2 = jnp.arange(128) < 100
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8,
                               valid1=v1, valid2=v2))
    got = np.asarray(nn_match_streamed(jnp.asarray(d1), jnp.asarray(d2),
                                       0.8, valid1=v1, valid2=v2,
                                       block1=32, block2=32, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_streamed_block_divisibility():
    d = jnp.zeros((8, 768), jnp.float32)
    with pytest.raises(ValueError):
        nn_match_streamed(d, jnp.zeros((100, 768), jnp.float32), 0.8,
                          block2=64)
