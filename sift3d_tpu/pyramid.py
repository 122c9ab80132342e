"""Gaussian scale-space (GSS) and difference-of-Gaussian (DoG) pyramids.

Reproduces the reference pyramid geometry and blur schedule exactly
(reference sift3d/sift.c:938-1071, imutil/imutil.c:3752-3802,3858-3992):

- first_octave = 0, first_level = -1
- num_gpyr_levels = num_kp_levels + 3, num_dog_levels = num_kp_levels + 2
- scale(o, s) = sigma0 * 2**(o + s / num_kp_levels)
- level dims halve per octave (integer division); units double per octave
- one bank of incremental filters built from the *first octave's* scales is
  reused at every octave with tap spacing ``1 / units[dim]`` voxels
  (build_gpyr passes unit=1.0, sift.c:1002; the spacing semantics are in
  convolve_sep_gen, imutil.c:2286-2289). NB: this means higher octaves
  receive proportionally narrower blurs than textbook scale space - that is
  the reference's actual behavior and is reproduced faithfully.
- octave o+1 level first_level is a strided 2x downsample of octave o level
  max(s_end - 2, first_level) (sift.c:1029-1042, imutil.c:1742-1768).

The pyramid plan (shapes, scales, conv matrices) is computed on the host;
build_gpyr/build_dog are pure jittable functions of the input volume.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import SIFT3DParams, num_octaves_for_dims
from .ops.gauss import gauss_taps, incremental_sigma
from .ops import conv


def level_scale(o: int, s: int, sigma0: float, num_kp_levels: int) -> float:
    """scale(o, s) = sigma0 * 2^(o + s/num_kp_levels) (imutil.c:3972)."""
    return sigma0 * 2.0 ** (o + float(s) / num_kp_levels)


@dataclasses.dataclass(frozen=True)
class LevelGeom:
    """Static geometry of one pyramid level."""
    o: int
    s: int
    dims: tuple[int, int, int]      # (nx, ny, nz)
    units: tuple[float, float, float]  # (ux, uy, uz), mm per voxel
    scale: float                    # absolute scale parameter


@dataclasses.dataclass(frozen=True)
class PyramidPlan:
    """Host-side static plan for GSS/DoG construction for one input shape."""
    dims: tuple[int, int, int]          # input (nx, ny, nz)
    units: tuple[float, float, float]   # input units
    params: SIFT3DParams
    num_octaves: int
    first_level: int                    # -1
    num_gpyr_levels: int
    num_dog_levels: int

    @property
    def last_gpyr_level(self) -> int:
        return self.first_level + self.num_gpyr_levels - 1

    @property
    def last_dog_level(self) -> int:
        return self.first_level + self.num_dog_levels - 1

    def octave_dims(self, o: int) -> tuple[int, int, int]:
        d = list(self.dims)
        for _ in range(o):
            d = [x // 2 for x in d]
        return tuple(d)

    def octave_units(self, o: int) -> tuple[float, float, float]:
        return tuple(u * (2.0 ** o) for u in self.units)

    def gpyr_level(self, o: int, s: int) -> LevelGeom:
        return LevelGeom(o, s, self.octave_dims(o), self.octave_units(o),
                         level_scale(o, s, self.params.sigma0,
                                     self.params.num_kp_levels))

    def gpyr_levels(self):
        for o in range(self.num_octaves):
            for s in range(self.first_level, self.last_gpyr_level + 1):
                yield self.gpyr_level(o, s)

    def dog_levels(self):
        for o in range(self.num_octaves):
            for s in range(self.first_level, self.last_dog_level + 1):
                yield self.gpyr_level(o, s)

    # -- filter bank -------------------------------------------------------

    def first_gauss_taps(self) -> np.ndarray:
        """Filter from sigma_n to scale(first_octave, first_level)."""
        p = self.params
        return gauss_taps(incremental_sigma(
            p.sigma_n,
            level_scale(0, self.first_level, p.sigma0, p.num_kp_levels)))

    def octave_filter_taps(self, s: int) -> np.ndarray:
        """Filter building level s from level s-1 (any octave).

        build_gpyr indexes the filter bank by raw level s (sift.c:1020),
        selecting the incremental filter from scale(first_octave, s-1) to
        scale(first_octave, s).
        """
        p = self.params
        return gauss_taps(incremental_sigma(
            level_scale(0, s - 1, p.sigma0, p.num_kp_levels),
            level_scale(0, s, p.sigma0, p.num_kp_levels)))

    @property
    def downsample_level(self) -> int:
        """Level whose 2x downsample seeds the next octave (sift.c:1031)."""
        return max(self.last_gpyr_level - 2, self.first_level)


def plan_pyramid(dims: tuple[int, int, int],
                 units: tuple[float, float, float],
                 params: SIFT3DParams) -> PyramidPlan:
    """Compute the static pyramid plan (resize_SIFT3D, sift.c:938-986)."""
    params.validate()
    nx, ny, nz = dims
    num_octaves = num_octaves_for_dims(nx, ny, nz)
    num_dog_levels = params.num_kp_levels + 2
    num_gpyr_levels = num_dog_levels + 1
    return PyramidPlan(
        dims=tuple(dims), units=tuple(float(u) for u in units), params=params,
        num_octaves=num_octaves, first_level=-1,
        num_gpyr_levels=num_gpyr_levels, num_dog_levels=num_dog_levels)


def im_scale(vol: jax.Array) -> jax.Array:
    """Scale to [-1, 1] by the max absolute value (imutil.c:1959-1991)."""
    m = jnp.max(jnp.abs(vol))
    return jnp.where(m == 0, vol, vol / m)


class Pyramid(dict):
    """A pyramid is a dict {(o, s): array(z, y, x)} plus its plan."""

    def __init__(self, plan: PyramidPlan, levels: dict):
        super().__init__(levels)
        self.plan = plan


def build_gpyr(vol: jax.Array, plan: PyramidPlan) -> dict:
    """Build the Gaussian pyramid from a scaled input volume.

    ``vol`` is (nz, ny, nx), already scaled to [-1, 1] by the caller
    (set_im_SIFT3D applies im_scale before building, sift.c:902-903).
    Returns {(o, s): array}.
    """
    first = plan.first_level
    last = plan.last_gpyr_level
    levels: dict = {}

    for o in range(plan.num_octaves):
        units_o = plan.octave_units(o)
        if o == 0:
            # Level `first` of octave 0: blur the input from sigma_n.
            levels[(o, first)] = conv.conv_sep(vol, plan.first_gauss_taps(),
                                               1.0, units_o)
        else:
            # Later octaves start from a strided 2x downsample of the
            # previous octave's downsample_level, with no extra blur
            # (sift.c:1029-1042; the scales match exactly there).
            src = levels[(o - 1, plan.downsample_level)]
            nxd, nyd, nzd = plan.octave_dims(o)
            # floor-halved dims (imutil.c:1748-1750) == successive int halving
            levels[(o, first)] = src[::2, ::2, ::2][:nzd, :nyd, :nxd]
        for s in range(first + 1, last + 1):
            taps = plan.octave_filter_taps(s)
            levels[(o, s)] = conv.conv_sep(levels[(o, s - 1)], taps, 1.0,
                                           units_o)
    return levels


# --- octave-pipelined builder (composed per-axis operators) ----------------
#
# SURVEY §5.7 names the sequential octave dependency (reference
# sift.c:1029-1042: each octave seeds from the previous octave's
# downsample_level) as the target for pipelining: "pipeline octaves across
# chips or re-blur from base per octave to break the dependency". Because
# every step of build_gpyr is a LINEAR per-axis operator - the blur is a
# banded matrix (ops/conv.py) and the 2x downsample-pick is a row-selection
# matrix - the whole pyramid factors exactly into per-axis matrix products
# composed on the host in float64:
#
#   seed(o)     = M_o  @ seed(0)          (M_o rectangular, n_o x n_base)
#   level(o, s) = C_os @ seed(o)          (C_os square, composed blurs)
#
# This is the "re-blur from base" variant made EXACT: the composed
# operators include the strided downsample-pick rows, so parity with the
# sequential path holds to float32 rounding (tested at 2e-6). The
# dependency depth collapses from 1 + num_octaves * (num_gpyr_levels - 2)
# sequential convolutions to 3 (first blur -> seed projection -> level
# projection), every level is independent given seed(0), and octaves can
# build concurrently - the XLA-native form of octave pipelining.

def _axis_lengths(dims):
    """(nx, ny, nz) -> per-axis lengths in (x, y, z) order."""
    return tuple(dims)


def composed_pyramid_operators(plan: PyramidPlan):
    """Host-side composed per-axis operators for the pipelined builder.

    Returns ``(seed_ops, level_ops)``:
      - ``seed_ops[o]``: per-axis (x, y, z) matrices mapping the octave-0
        seed (level ``(0, first)``) to octave o's seed, or None for o=0.
      - ``level_ops[(o, s)]``: per-axis matrices mapping octave o's seed
        to level ``(o, s)``, for s > first.
    All matrices float32, composed in float64.
    """
    first = plan.first_level
    last = plan.last_gpyr_level
    ds = plan.downsample_level

    level_ops: dict = {}
    seed_ops: list = [None]
    # M per axis accumulates the seed projection; identity at octave 0.
    M = [np.eye(n, dtype=np.float64) for n in _axis_lengths(plan.dims)]
    for o in range(plan.num_octaves):
        units_o = plan.octave_units(o)
        dims_o = plan.octave_dims(o)
        C = [np.eye(n, dtype=np.float64)
             for n in _axis_lengths(dims_o)]
        for s in range(first + 1, last + 1):
            taps = plan.octave_filter_taps(s)
            for d, (n, u) in enumerate(zip(_axis_lengths(dims_o), units_o)):
                W = conv.conv_matrix(taps, 1.0, u, n).astype(np.float64)
                C[d] = W @ C[d]
            level_ops[(o, s)] = tuple(c.astype(np.float32) for c in C)
            if s == ds and o + 1 < plan.num_octaves:
                # Seed of the next octave: strided 2x downsample-pick of
                # this level (sift.c:1029-1042) composed into M.
                dims_n = plan.octave_dims(o + 1)
                for d, n_next in enumerate(_axis_lengths(dims_n)):
                    sel = np.arange(n_next) * 2        # pick even indices
                    M[d] = C[d][sel] @ M[d]
        if o + 1 < plan.num_octaves:
            seed_ops.append(tuple(m.astype(np.float32) for m in M))
    return seed_ops, level_ops


def _apply_axis_op(vol: jax.Array, W: np.ndarray, axis: int) -> jax.Array:
    """Apply one composed per-axis operator: banded for long square
    matrices (same crossover as conv_sep), MXU matmul otherwise."""
    n_out, n_in = W.shape
    if n_out == n_in and n_in >= conv.BANDED_MIN_N:
        return conv.apply_banded_matrix(vol, W, axis)
    return conv.conv_axis(vol, W, axis)


def apply_sep_ops(vol: jax.Array, ops) -> jax.Array:
    """Apply per-axis (x, y, z) composed operators, x then y then z
    (the conv_sep dimension order, imutil.c:3494-3526)."""
    Wx, Wy, Wz = ops
    vol = _apply_axis_op(vol, Wx, -1)
    vol = _apply_axis_op(vol, Wy, -2)
    return _apply_axis_op(vol, Wz, -3)


def build_gpyr_pipelined(vol: jax.Array, plan: PyramidPlan,
                         ops=None) -> dict:
    """Octave-pipelined Gaussian pyramid: same {(o, s): array} contract as
    ``build_gpyr``, equal to it within float32 rounding, with dependency
    depth 3 instead of 1 + num_octaves * (num_gpyr_levels - 2)."""
    if ops is None:
        ops = composed_pyramid_operators(plan)
    seed_ops, level_ops = ops
    first = plan.first_level
    levels: dict = {}
    seed0 = conv.conv_sep(vol, plan.first_gauss_taps(), 1.0,
                          plan.octave_units(0))
    for o in range(plan.num_octaves):
        seed = seed0 if o == 0 else apply_sep_ops(seed0, seed_ops[o])
        levels[(o, first)] = seed
        for s in range(first + 1, plan.last_gpyr_level + 1):
            levels[(o, s)] = apply_sep_ops(seed, level_ops[(o, s)])
    return levels


def build_dog(gpyr: dict, plan: PyramidPlan) -> dict:
    """DoG levels: dog(o, s) = gpyr(o, s) - gpyr(o, s+1) (sift.c:1052-1071)."""
    dog: dict = {}
    for o in range(plan.num_octaves):
        for s in range(plan.first_level, plan.last_dog_level + 1):
            dog[(o, s)] = gpyr[(o, s)] - gpyr[(o, s + 1)]
    return dog
