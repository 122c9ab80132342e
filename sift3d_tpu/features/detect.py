"""Keypoint detection driver: GSS -> DoG -> extrema -> orientation.

Reproduces SIFT3D_detect_keypoints (reference sift3d/sift.c:1609-1641):
scale input to [-1, 1], build pyramids, detect extrema on DoG levels
s in [first_level+1, last_dog_level-1], assign orientations from the
corresponding gpyr levels, and compact rejected keypoints out while
preserving the reference's (octave, level, z, y, x) emission order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import pyramid as pyr_mod
from ..config import SIFT3DParams
from ..dtypes import f64
from . import extrema, orientation
from .keypoints import Keypoints, concatenate


def _level_keypoints(zyx, count, R, ori_valid, o, s, sd, capacity):
    """Compact one level's keypoints after orientation rejection."""
    idx = jnp.arange(capacity, dtype=jnp.int32)
    valid = (idx < count) & ori_valid
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid, pos, capacity)
    new_count = (pos[-1] + 1).astype(jnp.int32)

    def scatter(vals, shape, dtype):
        buf = jnp.zeros((capacity + 1,) + shape, dtype)
        return buf.at[dest].set(vals.astype(dtype))[:capacity]

    return Keypoints(
        x=scatter(zyx[:, 2], (), f64()),
        y=scatter(zyx[:, 1], (), f64()),
        z=scatter(zyx[:, 0], (), f64()),
        o=jnp.full((capacity,), o, jnp.int32),
        s=jnp.full((capacity,), s, jnp.int32),
        sd=jnp.full((capacity,), sd, f64()),
        R=scatter(R, (3, 3), jnp.float32),
        count=new_count)


def detect_keypoints_pyr(gpyr: dict, dog: dict, plan,
                         params: SIFT3DParams) -> Keypoints:
    """Detect + orient keypoints given prebuilt pyramids."""
    cap = params.max_kp_per_level
    s_start = plan.first_level + 1
    s_end = plan.last_dog_level - 1
    buckets = []
    for o in range(plan.num_octaves):
        units_o = plan.octave_units(o)
        for s in range(s_start, s_end + 1):
            zyx, count = extrema.level_extrema(
                dog[(o, s - 1)], dog[(o, s)], dog[(o, s + 1)],
                params.peak_thresh, cap)
            geom = plan.gpyr_level(o, s)
            R, valid = orientation.assign_orientations_level(
                gpyr[(o, s)], zyx, geom.scale, units_o,
                params.corner_thresh)
            # Rows past `count` are padding; make sure they never pass.
            buckets.append(_level_keypoints(
                zyx, count, R, valid, o, s, geom.scale, cap))
    return concatenate(buckets)


def detect_keypoints(vol: jax.Array, units: tuple[float, float, float],
                     params: SIFT3DParams):
    """Full detection from a raw (nz, ny, nx) volume.

    Returns (keypoints, gpyr, plan); gpyr is reused by descriptor
    extraction, mirroring the persistent pyramid in the reference's SIFT3D
    struct (sift.c:2025-2046).
    """
    nz, ny, nx = vol.shape
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)
    scaled = pyr_mod.im_scale(vol.astype(jnp.float32))
    gpyr = pyr_mod.build_gpyr(scaled, plan)
    dog = pyr_mod.build_dog(gpyr, plan)
    kp = detect_keypoints_pyr(gpyr, dog, plan, params)
    return kp, gpyr, plan
