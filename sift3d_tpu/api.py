"""User-facing API: the analog of the reference's Matlab toolbox surface
(detectSift3D / extractSift3D / matchSift3D / registerSift3D / imRead3D /
imWrite3D, SURVEY §2 components 30-32) plus the C library's Reg_SIFT3D
pipeline (reg/reg.c).

The Sift3D class keeps the Gaussian pyramid of the last detection, like the
mex toolbox's persistent process-global SIFT3D struct (mexutil.c:53-66), so
extract() can reuse it without recomputation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pyramid as pyr_mod
from .config import MatchParams, RansacParams, SIFT3DParams
from .dtypes import f64
from .features import match as match_mod
from .features.dense import extract_dense_descriptors
from .features.descriptor import (Descriptors, extract_descriptors,
                                  extract_raw_descriptors)
from .features import detect as detect_mod
from .features.keypoints import Keypoints, head as kp_head
from .io import im_read, im_write  # noqa: F401  (re-exported)
from .io.volume import Volume
from .ops.interp import im_inv_transform, im_resample
from .register.pipeline import register_pair


def _as_array(im):
    if isinstance(im, Volume):
        return np.asarray(im.data), im.units
    return np.asarray(im), None


# Compiled pipelines, cached per (shape, units, params) - the analog of the
# reference's shape-keyed deferred allocation (set_im_SIFT3D, sift.c:893-910)
# translated to jit-compilation caching.

def _pow2_cap(n: int, lo: int = 32, hi: int = 1 << 30) -> int:
    """Round a count up to a power of two (bounds jit-cache variants)."""
    cap = lo
    while cap < min(n, hi):
        cap *= 2
    return min(cap, hi)


@functools.lru_cache(maxsize=64)
def _extrema_fn(shape_zyx, units, params: SIFT3DParams):
    """Stage A: pyramid + DoG extrema (dense work, static shapes)."""
    nz, ny, nx = shape_zyx
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)

    @jax.jit
    def fn(vol):
        scaled = pyr_mod.im_scale(vol.astype(jnp.float32))
        gpyr = pyr_mod.build_gpyr(scaled, plan)
        dog = pyr_mod.build_dog(gpyr, plan)
        ext = detect_mod.detect_extrema_levels(dog, plan, params)
        # Stacked per-level counts: ONE device array so the host sync is a
        # single D2H transfer (separate scalars cost a ~11 ms tunnel round
        # trip each on this environment).
        counts_vec = jnp.stack(
            [ext[k][1] for k in sorted(ext)]).astype(jnp.int32)
        return gpyr, ext, counts_vec
    return fn, plan


@functools.lru_cache(maxsize=256)
def _orient_fn(shape_zyx, units, params: SIFT3DParams, caps_key):
    """Stage B: orientation at host-chosen per-level capacities."""
    nz, ny, nx = shape_zyx
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)
    caps = dict(caps_key)

    @jax.jit
    def fn(gpyr, ext):
        kp = detect_mod.orient_levels(gpyr, ext, caps, plan, params)
        lvl_counts = _stacked_level_counts(kp, plan)
        return kp, lvl_counts
    return fn


def _stacked_level_counts(kp: Keypoints, plan) -> jax.Array:
    """Per-(o, s) valid-keypoint counts as ONE stacked i32 vector (sorted
    kp_levels order), so downstream host bucketing needs a single D2H
    transfer instead of one per level."""
    valid = kp.valid_mask()
    return jnp.stack([
        jnp.sum(valid & (kp.o == o) & (kp.s == s)).astype(jnp.int32)
        for (o, s) in sorted(detect_mod.kp_levels(plan))])


@functools.lru_cache(maxsize=64)
def _fused_all_fn(shape_zyx, units, params: SIFT3DParams):
    """Single-program detect + extract at optimistic static capacities.

    One dispatch, one host sync: pyramid -> extrema -> orientation ->
    Pallas descriptor extraction all in one jitted program, with every
    per-level bucket capped at ``params.fused_bucket_cap``. An in-program
    overflow flag records whether any level's extrema hit that cap; the
    caller then falls back to the exact two-stage host-bucketed path
    (rare - real volumes have tens of keypoints per level). The Pallas
    window kernel skips bucket rows beyond the in-program counts, so the
    static caps cost only gather width, not compute.
    """
    nz, ny, nx = shape_zyx
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)
    lvls = sorted(detect_mod.kp_levels(plan))
    full = {lv: detect_mod.level_cap(plan, lv[0], params) for lv in lvls}
    caps = {lv: min(params.fused_bucket_cap, full[lv]) for lv in lvls}

    @jax.jit
    def fn(vol):
        scaled = pyr_mod.im_scale(vol.astype(jnp.float32))
        gpyr = pyr_mod.build_gpyr(scaled, plan)
        dog = pyr_mod.build_dog(gpyr, plan)
        ext = detect_mod.detect_extrema_levels(dog, plan, params)
        # Overflow: a level found more extrema than its optimistic cap
        # while a larger contract cap exists (truncation at the contract
        # cap itself is expected behavior, not overflow). ext[lv][2] is
        # the UNCLAMPED total, so count == cap with exactly cap extrema
        # no longer triggers a spurious two-stage fallback.
        over = [(ext[lv][2] > caps[lv]) for lv in lvls
                if caps[lv] < full[lv]]
        overflow = jnp.any(jnp.stack(over)) if over \
            else jnp.asarray(False)
        kp = detect_mod.orient_levels(gpyr, ext, caps, plan, params)
        lvl_counts = _stacked_level_counts(kp, plan)
        desc = extract_descriptors(gpyr, kp, plan, params,
                                   level_caps=caps)
        return kp, lvl_counts, desc, overflow, gpyr
    return fn, plan


@functools.lru_cache(maxsize=256)
def _orient_extract_fn(shape_zyx, units, params: SIFT3DParams, caps_key,
                       kp_cap: int):
    """Fused stage B+C: orientation + descriptor extraction in ONE program.

    Capacities come from the *extrema* counts (stage A), so no second
    host sync is needed between orientation and extraction - the Pallas
    window kernel skips rows beyond the in-program post-orientation
    counts, which makes the looser extrema-based caps nearly free (only
    the XLA window gather runs at cap size).
    """
    nz, ny, nx = shape_zyx
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)
    caps = dict(caps_key)

    @jax.jit
    def fn(gpyr, ext):
        kp = detect_mod.orient_levels(gpyr, ext, caps, plan, params)
        lvl_counts = _stacked_level_counts(kp, plan)
        desc = extract_descriptors(gpyr, kp_head(kp, kp_cap), plan, params,
                                   level_caps=caps)
        return kp, lvl_counts, desc
    return fn


@functools.lru_cache(maxsize=256)
def _extract_fn(shape_zyx, units, params: SIFT3DParams, kp_cap: int,
                caps_key=None):
    nz, ny, nx = shape_zyx
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)
    level_caps = dict(caps_key) if caps_key is not None else None

    @jax.jit
    def fn(gpyr, kp):
        return extract_descriptors(gpyr, kp_head(kp, kp_cap), plan, params,
                                   level_caps=level_caps)
    return fn


@functools.lru_cache(maxsize=256)
def _extract_raw_fn(shape_zyx, units, params: SIFT3DParams, kp_cap: int):
    nz, ny, nx = shape_zyx
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)

    @jax.jit
    def fn(vol, kp):
        return extract_raw_descriptors(vol, kp_head(kp, kp_cap), units,
                                       plan, params)
    return fn


@functools.lru_cache(maxsize=64)
def _dense_fn(shape_zyx, units, params: SIFT3DParams):
    return jax.jit(functools.partial(
        extract_dense_descriptors, units=units, params=params))


@functools.lru_cache(maxsize=64)
def _register_fn(src_units, ref_units, match_params, ransac_params):
    @jax.jit
    def fn(d_src, d_ref):
        return register_pair(d_src, d_ref, src_units, ref_units,
                             match_params, ransac_params)
    return fn


class Sift3D:
    """Detector/descriptor engine with a persistent pyramid.

    Equivalent to the reference SIFT3D struct + its mex persistence
    (imtypes.h:309-334, mexutil.c:53-66).
    """

    def __init__(self, params: SIFT3DParams = SIFT3DParams()):
        params.validate()
        self.params = params
        self._gpyr = None
        self._plan = None
        self._kp: Keypoints | None = None
        self._lvl_counts = None
        self._shape_units = None

    def detect(self, im, units=(1.0, 1.0, 1.0)) -> Keypoints:
        """Detect keypoints (SIFT3D_detect_keypoints, sift.c:1609-1641).

        Two stages with a host sync between them: dense extrema detection
        at static shapes, then orientation at capacities bucketed (powers
        of two) from the actual per-level extrema counts, so the windowed
        gathers scale with real keypoint counts.
        """
        data, vunits = _as_array(im)
        units = tuple(vunits or units)
        fn, plan = _extrema_fn(data.shape, units, self.params)
        gpyr, ext, counts_vec = fn(jnp.asarray(data))
        # ONE D2H transfer for all level counts.
        counts = np.asarray(counts_vec)
        levels = sorted(ext)
        caps_key = tuple(
            (level, _pow2_cap(int(count),
                              hi=detect_mod.level_cap(plan, level[0],
                                                      self.params)))
            for level, count in zip(levels, counts))
        orient = _orient_fn(data.shape, units, self.params, caps_key)
        kp, lvl_counts = orient(gpyr, ext)
        self._gpyr, self._plan, self._kp = gpyr, plan, kp
        self._lvl_counts = lvl_counts
        self._shape_units = (data.shape, units)
        return kp

    def extract(self, kp: Keypoints | None = None) -> Descriptors:
        """Extract descriptors from the stored pyramid
        (SIFT3D_extract_descriptors, sift.c:2025-2046). Keypoint rows are
        bucketed to pow2(count) globally AND per level, so the windowed
        gathers scale with the real per-level keypoint counts."""
        if self._gpyr is None:
            raise RuntimeError("call detect() before extract()")
        plan = self._plan
        if kp is None or kp is self._kp:
            kp = self._kp
            lvl_counts = self._lvl_counts
        else:
            lvl_counts = jax.jit(functools.partial(
                _stacked_level_counts, plan=plan))(kp)
        # ONE D2H transfer for all per-level counts.
        counts = np.asarray(lvl_counts)
        n = int(counts.sum())
        cap = min(_pow2_cap(n), kp.capacity)
        caps = [(level, 0 if c == 0 else _pow2_cap(int(c), lo=8, hi=cap))
                for level, c in zip(sorted(detect_mod.kp_levels(plan)),
                                    counts)]
        fn = _extract_fn(*self._shape_units, self.params, cap,
                         tuple(sorted(caps)))
        return fn(self._gpyr, kp)

    def detect_and_extract(self, im, units=(1.0, 1.0, 1.0)):
        """Detect + extract in one call. Returns (Keypoints, Descriptors).

        Fast path: ONE device program (pyramid -> extrema -> orientation
        -> Pallas extraction) at optimistic static bucket capacities
        (params.fused_bucket_cap) and ONE host sync (the overflow flag).
        When a level overflows the optimistic cap, falls back to the
        exact two-stage path whose capacities are host-bucketed from the
        synced extrema counts.
        """
        data, vunits = _as_array(im)
        units = tuple(vunits or units)
        fused, plan = _fused_all_fn(data.shape, units, self.params)
        volj = jnp.asarray(data)
        kp, lvl_counts, desc, overflow, gpyr = fused(volj)
        if bool(overflow):                    # the ONE host sync
            # Hand the DEVICE copy to the fallback: re-transferring the
            # host volume costs ~1.7 s at 256^3 through the tunnel.
            return self._detect_and_extract_two_stage(volj, units)
        self._gpyr, self._plan, self._kp = gpyr, plan, kp
        self._lvl_counts = lvl_counts
        self._shape_units = (data.shape, units)
        return kp, desc

    def _detect_and_extract_two_stage(self, data, units):
        """Exact path: host-bucketed capacities from synced extrema
        counts; two device programs, two host syncs. (Round 1 measured a
        statically-capped fused program SLOWER under the XLA extract
        path, 6.6M vs 8.4M voxel/s, because there the full compute
        scaled with cap; the Pallas count-skip kernel removed that.)"""
        fn, plan = _extrema_fn(data.shape, units, self.params)
        gpyr, ext, counts_vec = fn(jnp.asarray(data))
        counts = np.asarray(counts_vec)        # host sync
        levels = sorted(ext)
        caps_key = tuple(
            (level, _pow2_cap(int(count), lo=8,
                              hi=detect_mod.level_cap(plan, level[0],
                                                      self.params)))
            for level, count in zip(levels, counts))
        kp_cap = min(_pow2_cap(int(counts.sum())),
                     sum(c for _, c in caps_key))
        fused = _orient_extract_fn(data.shape, units, self.params,
                                   caps_key, kp_cap)
        kp, lvl_counts, desc = fused(gpyr, ext)
        self._gpyr, self._plan, self._kp = gpyr, plan, kp
        self._lvl_counts = lvl_counts
        self._shape_units = (data.shape, units)
        return kp, desc

    def extract_raw(self, im, kp: Keypoints,
                    units=(1.0, 1.0, 1.0)) -> Descriptors:
        """Descriptors from a raw image + keypoint list
        (SIFT3D_extract_raw_descriptors, sift.c:2131-2195)."""
        data, vunits = _as_array(im)
        units = tuple(vunits or units)
        cap = min(_pow2_cap(int(kp.count)), kp.capacity)
        fn = _extract_raw_fn(data.shape, units, self.params, cap)
        return fn(jnp.asarray(data), kp)

    def dense(self, im, units=(1.0, 1.0, 1.0)) -> np.ndarray:
        """Dense descriptor image (12, nz, ny, nx)."""
        data, vunits = _as_array(im)
        units = tuple(vunits or units)
        fn = _dense_fn(data.shape, units, self.params)
        return np.asarray(fn(jnp.asarray(data)))


def assign_orientations(im, kp: Keypoints, units=(1.0, 1.0, 1.0),
                        params: SIFT3DParams = SIFT3DParams()):
    """Orientations + confidences for keypoints on a raw image
    (SIFT3D_assign_orientations, sift.c:1534-1607; the orientation3D.m
    analog). Rejected keypoints get R = I and confidence -1."""
    from .features.orientation import assign_orientations_raw

    data, vunits = _as_array(im)
    units = tuple(vunits or units)
    nz, ny, nx = data.shape[:3]
    plan = pyr_mod.plan_pyramid((nx, ny, nz), units, params)
    R, conf = assign_orientations_raw(jnp.asarray(data), kp, units, plan,
                                      params)
    return np.asarray(R), np.asarray(conf)


def validate_keypoints(kp: Keypoints, dims_xyz=None,
                       tol: float = 1e-3) -> None:
    """Keypoint sanity checks mirroring keypoint3D.m / detectValidTest:
    in-bounds base-octave coordinates and orthogonal, right-handed
    rotations (Sift3DTest.m:245-274, keypoint3D.m:84-103).

    Raises ValueError on the first violation.
    """
    n = int(kp.count)
    if n == 0:
        return
    R = np.asarray(kp.R)[:n]
    rtr = np.einsum("kij,kil->kjl", R, R)
    err = np.abs(rtr - np.eye(3)).max(axis=(1, 2))
    if (err > tol).any():
        raise ValueError(
            f"keypoint {int(np.argmax(err > tol))}: R is not orthogonal "
            f"(|R'R - I| = {err.max():.2e})")
    det = np.linalg.det(R)
    if (np.abs(det - 1.0) > tol).any():
        raise ValueError("rotation matrix determinant != +1 "
                         "(reflections are invalid orientations)")
    if dims_xyz is not None:
        f = 2.0 ** np.asarray(kp.o)[:n]
        for c, (arr, dim) in enumerate(
                [(np.asarray(kp.x)[:n], dims_xyz[0]),
                 (np.asarray(kp.y)[:n], dims_xyz[1]),
                 (np.asarray(kp.z)[:n], dims_xyz[2])]):
            base = arr * f
            if (base < 0).any() or (base > dim - 1).any():
                raise ValueError(
                    f"keypoint coordinate axis {c} out of bounds")


def descriptors_from_rows(rows: np.ndarray,
                          capacity: int | None = None) -> Descriptors:
    """Rebuild a Descriptors set from CSV rows [x y z el0..el767]
    (SIFT3D_Descriptor_store_from_Mat_rm, sift.c:2721-2768) - enables the
    matchSift3D workflow of matching precomputed descriptor files."""
    rows = np.asarray(rows)
    if rows.ndim != 2 or rows.shape[1] != 771:
        raise ValueError(f"descriptor rows must be (N, 771), got "
                         f"{rows.shape}")
    n = len(rows)
    cap = capacity or max(n, 1)

    def pad(a, dtype):
        out = np.zeros((cap,) + a.shape[1:], dtype)
        out[:min(n, cap)] = a[:cap]
        return jnp.asarray(out)
    return Descriptors(xyz=pad(rows[:, :3], np.float64),
                       sd=jnp.zeros((cap,), jnp.float32),
                       vec=pad(rows[:, 3:], np.float32),
                       count=jnp.int32(min(n, cap)))


def match_descriptors(d1: Descriptors, d2: Descriptors,
                      nn_thresh: float = MatchParams().nn_thresh,
                      ssd_dtype=jnp.float32) -> np.ndarray:
    """Match two descriptor sets; returns (N1,) int32 indices or -1
    (SIFT3D_nn_match, sift.c:2840-2888)."""
    return np.asarray(match_mod.nn_match(
        d1.vec, d2.vec, nn_thresh, d1.valid_mask(), d2.valid_mask(),
        dtype=ssd_dtype))


@dataclasses.dataclass
class Registration:
    """Host-side registration result."""
    A: np.ndarray                  # (3, 4) voxel-space affine, ref -> src
    match_src: np.ndarray          # (M, 3) matched src coords
    match_ref: np.ndarray          # (M, 3) matched ref coords
    num_inliers: int
    ok: bool


def _scale_descriptors(desc: Descriptors, factors) -> Descriptors:
    """scale_SIFT3D (reg.c:320-348): coords *= factors; sd *= det^(-1/3)."""
    factors = np.asarray(factors, np.float64)
    det = float(np.prod(factors))
    return Descriptors(
        xyz=desc.xyz * jnp.asarray(factors, f64())[None, :],
        sd=desc.sd * (det ** (-1.0 / 3.0)),
        vec=desc.vec, count=desc.count)


class RegSift3D:
    """Pairwise registration pipeline (Reg_SIFT3D, reg/reg.c)."""

    def __init__(self, params: SIFT3DParams = SIFT3DParams(),
                 match_params: MatchParams = MatchParams(),
                 ransac_params: RansacParams = RansacParams()):
        match_params.validate()
        ransac_params.validate()
        self.sift = Sift3D(params)
        self.match_params = match_params
        self.ransac_params = ransac_params

    def _detect_extract(self, im, units):
        _, desc = self.sift.detect_and_extract(im, units)
        return desc

    def register(self, src, ref, src_units=(1.0, 1.0, 1.0),
                 ref_units=(1.0, 1.0, 1.0), resample: bool = False,
                 interp: str = "linear") -> Registration:
        """register_SIFT3D / register_SIFT3D_resample (reg.c:239-429).

        Returns the voxel-space affine mapping ref coords to src coords.
        """
        src_data, su = _as_array(src)
        ref_data, ru = _as_array(ref)
        src_units = tuple(su or src_units)
        ref_units = tuple(ru or ref_units)

        if resample and src_units != ref_units:
            # Resample both to the finer common units (reg.c:366-429).
            units_min = tuple(min(a, b)
                              for a, b in zip(src_units, ref_units))
            src_i = np.asarray(im_resample(jnp.asarray(src_data), src_units,
                                           units_min, interp))
            ref_i = np.asarray(im_resample(jnp.asarray(ref_data), ref_units,
                                           units_min, interp))
            d_src = self._detect_extract(src_i, units_min)
            d_src = _scale_descriptors(
                d_src, [um / u for um, u in zip(units_min, src_units)])
            d_ref = self._detect_extract(ref_i, units_min)
            d_ref = _scale_descriptors(
                d_ref, [um / u for um, u in zip(units_min, ref_units)])
            # The reference registers in the resampled images' units
            # (reg->*_units are set from the interpolated images,
            # reg.c:183-229), with coordinates already scaled back to the
            # original voxel grids.
            reg_src_units = reg_ref_units = units_min
        else:
            d_src = self._detect_extract(src_data, src_units)
            d_ref = self._detect_extract(ref_data, ref_units)
            reg_src_units, reg_ref_units = src_units, ref_units

        fn = _register_fn(tuple(reg_src_units), tuple(reg_ref_units),
                          self.match_params, self.ransac_params)
        res = fn(d_src, d_ref)
        n = int(res.num_matches)
        return Registration(
            A=np.asarray(res.A),
            match_src=np.asarray(res.match_src)[:n],
            match_ref=np.asarray(res.match_ref)[:n],
            num_inliers=int(res.num_inliers), ok=bool(res.ok))

    def register_tps(self, src, ref, src_units=(1.0, 1.0, 1.0),
                     ref_units=(1.0, 1.0, 1.0), reg: float = 1e-6):
        """Nonrigid registration: affine RANSAC outlier rejection, then
        a thin-plate-spline fit on the inliers (register_pair_tps) - a
        capability the reference declares but never implemented
        (imutil.c:4504-4508). Returns (Registration, Tps | None); the
        TPS maps ref mm coordinates to src mm coordinates (warp with
        register.tps.im_inv_transform_tps)."""
        from .register.pipeline import register_pair_tps

        src_data, su = _as_array(src)
        ref_data, ru = _as_array(ref)
        src_units = tuple(su or src_units)
        ref_units = tuple(ru or ref_units)
        d_src = self._detect_extract(src_data, src_units)
        d_ref = self._detect_extract(ref_data, ref_units)
        res, tps = register_pair_tps(d_src, d_ref, src_units, ref_units,
                                     self.match_params,
                                     self.ransac_params, reg=reg)
        n = int(res.num_matches)
        return Registration(
            A=np.asarray(res.A),
            match_src=np.asarray(res.match_src)[:n],
            match_ref=np.asarray(res.match_ref)[:n],
            num_inliers=int(res.num_inliers), ok=bool(res.ok)), tps


def warp(src, A: np.ndarray, out_shape_zyx=None,
         interp: str = "linear") -> np.ndarray:
    """Pull-warp src through the affine A (im_inv_transform,
    imutil.c:2040-2081); pairs with Registration.A to warp src onto ref."""
    data, _ = _as_array(src)
    return np.asarray(im_inv_transform(jnp.asarray(np.asarray(A, np.float64)),
                                       jnp.asarray(data), out_shape_zyx,
                                       interp))
