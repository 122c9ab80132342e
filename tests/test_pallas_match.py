"""Pallas streaming matcher vs the XLA matcher.

Runs both the generic interpreter and the TPU interpreter
(pltpu.InterpretParams): the latter models the TPU's output-block
double-buffering and rejects accumulation patterns that revisit blocks
non-consecutively - the failure mode of a previous fused two-direction
kernel - so a multi-block grid passing here is evidence the reduction
is safe on real hardware, not just in the generic interpreter.
"""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

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
                                       0.8, block1=32, block2=64,
                                       interpret=True))
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
                                       block1=32, block2=32,
                                       interpret=True))
    np.testing.assert_array_equal(got, want)


def test_streamed_non_divisible_pads_internally(rng):
    """N1/N2 not divisible by the block sizes: padded internally."""
    d1 = _descriptors(rng, 57)
    d2 = _descriptors(rng, 101)
    for i in range(15):
        d2[i] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i] /= np.linalg.norm(d2[i])
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8))
    got = np.asarray(nn_match_streamed(jnp.asarray(d1), jnp.asarray(d2),
                                       0.8, block1=32, block2=32,
                                       interpret=True))
    np.testing.assert_array_equal(got, want)


def test_streamed_tpu_interpreter_multiblock(rng):
    """TPU-interpret-mode run with a (>1, >1) grid in both directions.

    The TPU interpreter enforces the revisiting rule for output blocks,
    so this test fails (not just miscomputes) if the accumulation ever
    returns to a non-consecutive grid pattern."""
    d1 = _descriptors(rng, 96)
    d2 = _descriptors(rng, 128)
    for i in range(30):
        d2[i + 3] = d1[i] + rng.normal(0, 0.004, 768).astype(np.float32)
        d2[i + 3] /= np.linalg.norm(d2[i + 3])
    want = np.asarray(nn_match(jnp.asarray(d1), jnp.asarray(d2), 0.8))
    got = np.asarray(nn_match_streamed(
        jnp.asarray(d1), jnp.asarray(d2), 0.8, block1=32, block2=32,
        interpret=pltpu.InterpretParams()))
    np.testing.assert_array_equal(got, want)
