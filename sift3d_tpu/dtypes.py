"""Dtype helpers.

The reference mixes float and double arithmetic. On TPU, float64 is
software-emulated (usable for small per-keypoint math, too slow for volume
ops). We use f64 where the reference does when JAX x64 is enabled, and fall
back to f32 otherwise; all parity tests run with x64 enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def f64():
    """float64 if x64 is enabled, else float32 (no warning spam)."""
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
