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


def kp_levels(plan):
    """The (o, s) levels that can hold keypoints (sift.c:1086-1089)."""
    s_start = plan.first_level + 1
    s_end = plan.last_dog_level - 1
    return [(o, s) for o in range(plan.num_octaves)
            for s in range(s_start, s_end + 1)]


def level_cap(plan, o: int, params: SIFT3DParams) -> int:
    """Static extrema capacity for one level: the user cap (per-octave
    when ``max_kp_per_octave`` is set) clamped to the interior voxel
    count (extrema live in [1, n-2]^3)."""
    nx, ny, nz = plan.octave_dims(o)
    interior = max((nx - 2), 1) * max((ny - 2), 1) * max((nz - 2), 1)
    cap = params.max_kp_per_level
    if params.max_kp_per_octave:
        per_o = params.max_kp_per_octave
        cap = min(cap, per_o[min(o, len(per_o) - 1)])
    return min(cap, interior)


def detect_extrema_levels(dog: dict, plan, params: SIFT3DParams) -> dict:
    """Stage A: DoG extrema per level -> {(o, s): (zyx, count, total)}.

    ``total`` is the unclamped per-level extrema count; ``total > cap``
    means rows were truncated at the fixed capacity (the reference's
    keypoint slab is unbounded, immacros.h:199-222, so truncation must be
    reported, never silent)."""
    out = {}
    for o, s in kp_levels(plan):
        out[(o, s)] = extrema.level_extrema(
            dog[(o, s - 1)], dog[(o, s)], dog[(o, s + 1)],
            params.peak_thresh, level_cap(plan, o, params))
    return out


def orient_levels(gpyr: dict, extrema_levels: dict, caps: dict, plan,
                  params: SIFT3DParams) -> Keypoints:
    """Stage B: orientation + compaction, at per-level capacities ``caps``.

    ``caps[(o, s)]`` bounds the keypoints processed on that level (rows
    beyond it are dropped, matching the fixed-capacity contract). Splitting
    A/B lets the host pick caps from the actual extrema counts, so the
    windowed gathers scale with real keypoint counts instead of worst-case
    padding - the TPU analog of the reference's exact-size OpenMP loops
    (sift.c:1273, 2229).
    """
    buckets = []
    for o, s in kp_levels(plan):
        zyx, count = extrema_levels[(o, s)][:2]
        cap = caps[(o, s)]
        zyx = zyx[:cap]
        count = jnp.minimum(count, cap)
        geom = plan.gpyr_level(o, s)
        R, valid = orientation.assign_orientations_level(
            gpyr[(o, s)], zyx, geom.scale, plan.octave_units(o),
            params.corner_thresh, count=count)
        buckets.append(_level_keypoints(
            zyx, count, R, valid, o, s, geom.scale, cap))
    return concatenate(buckets)


def detect_keypoints_pyr(gpyr: dict, dog: dict, plan,
                         params: SIFT3DParams) -> Keypoints:
    """Detect + orient keypoints given prebuilt pyramids (single program,
    static worst-case capacities; the two-stage host-bucketed path in
    api.Sift3D is faster when counts are far below the cap)."""
    ext = detect_extrema_levels(dog, plan, params)
    caps = {k: level_cap(plan, k[0], params) for k in ext}
    return orient_levels(gpyr, ext, caps, plan, params)


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
