"""Batched, mesh-sharded end-to-end pipelines.

The TPU-native replacement for the reference's single-process OpenMP design
(SURVEY §2.3): a batch of volumes is data-parallel over the mesh axis
"data", and each volume's scale-space - the HBM-bandwidth hot spot
(build_gpyr, reference sift.c:989-1050) - is spatially partitioned along z
over the axis "space" with halo exchange (conv_sep_sharded). Octaves whose
z extent is too small to shard (halo wider than the shard) fall back to
replicated-z compute under a data-only sharding constraint; the deep
octaves are geometrically tiny so this costs little.

Sparse stages (extrema, orientation, descriptors) and per-pair matching /
RANSAC are vmapped over the batch and ride the "data" axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import pyramid as pyr_mod
from ..config import MatchParams, RansacParams, SIFT3DParams
from ..features.descriptor import extract_descriptors
from ..features.detect import detect_keypoints_pyr  # noqa: F401 (re-export)
from ..ops import conv
from .shard_conv import conv_sep_sharded


_SPATIAL_DIMS = {"z": 0, "y": 1, "x": 2}


def _conv_shardable(taps, unit: float, unit_dim: float, n: int,
                    n_space: int) -> bool:
    """Whether a sharded halo conv is valid for this filter/extent."""
    if n_space <= 1:
        return False
    if n % n_space:
        return False
    W = conv.conv_matrix(np.asarray(taps, np.float32), unit, unit_dim, n)
    rows, cols = np.nonzero(W)
    H = int(np.max(np.abs(cols - rows))) if len(rows) else 0
    return H <= n // n_space


def _conv_level(vols, taps, units_o, mesh, shard_dim: str = "z"):
    """One blur of a (B, nz, ny, nx) batch: sharded spatial pass along
    ``shard_dim`` when possible."""
    sd = _SPATIAL_DIMS[shard_dim]
    n = vols.shape[1 + sd]
    if _conv_shardable(taps, 1.0, units_o[2 - sd], n, mesh.shape["space"]):
        return conv_sep_sharded(vols, taps, 1.0, units_o, mesh,
                                shard_dim=shard_dim)
    out = conv.conv_sep(vols, taps, 1.0, units_o)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("data", None, None, None)))


def build_gpyr_batched(vols: jax.Array, plan, mesh: Mesh,
                       pipelined: bool = False,
                       shard_dim: str = "z") -> dict:
    """Batched GSS pyramid: {(o, s): (B, nz, ny, nx)}.

    Mirrors pyramid.build_gpyr level-for-level; the input batch must already
    be scaled to [-1, 1] per volume.

    With ``pipelined=True`` (and no "space" sharding, whose halo exchange
    is tap-based), levels are built by the composed-operator formulation
    (pyramid.build_gpyr_pipelined): dependency depth drops from
    ``1 + num_octaves * (num_gpyr_levels - 2)`` convolutions to 3, equal
    to the sequential path within float32 rounding.
    """
    first = plan.first_level
    last = plan.last_gpyr_level
    levels: dict = {}
    if pipelined and mesh.shape["space"] == 1:
        rep = NamedSharding(mesh, P("data", None, None, None))
        seed_ops, level_ops = pyr_mod.composed_pyramid_operators(plan)
        seed0 = _conv_level(vols, plan.first_gauss_taps(),
                            plan.octave_units(0), mesh, shard_dim)
        for o in range(plan.num_octaves):
            seed = seed0 if o == 0 else jax.lax.with_sharding_constraint(
                pyr_mod.apply_sep_ops(seed0, seed_ops[o]), rep)
            levels[(o, first)] = seed
            for s in range(first + 1, last + 1):
                levels[(o, s)] = jax.lax.with_sharding_constraint(
                    pyr_mod.apply_sep_ops(seed, level_ops[(o, s)]), rep)
        return levels
    for o in range(plan.num_octaves):
        units_o = plan.octave_units(o)
        if o == 0:
            levels[(o, first)] = _conv_level(vols, plan.first_gauss_taps(),
                                             units_o, mesh, shard_dim)
        else:
            src = levels[(o - 1, plan.downsample_level)]
            nxd, nyd, nzd = plan.octave_dims(o)
            down = src[:, ::2, ::2, ::2][:, :nzd, :nyd, :nxd]
            levels[(o, first)] = jax.lax.with_sharding_constraint(
                down, NamedSharding(mesh, P("data", None, None, None)))
        for s in range(first + 1, last + 1):
            levels[(o, s)] = _conv_level(levels[(o, s - 1)],
                                         plan.octave_filter_taps(s),
                                         units_o, mesh, shard_dim)
    return levels


def batch_detect_describe(vols: jax.Array, plan, params: SIFT3DParams,
                          mesh: Mesh, pipelined: bool = False,
                          shard_dim: str = "z"):
    """Detect + describe a batch of volumes: DP over "data", SP over "space".

    Args:
      vols: (B, nz, ny, nx) raw volumes (one shape per plan).
      shard_dim: which spatial axis the "space" mesh axis slices
        ("z"/"y"/"x"); non-z choices matter for thin-z geometries such
        as the reference's y-z-plane mammograms (dicom.cpp:494-515).

    Returns (keypoints, descriptors, kp_overflow) pytrees with a leading
    batch axis; kp_overflow is a (B,) bool flag, True where a level of
    that volume found more extrema than the per-level contract cap
    (params.max_kp_per_level clamp), i.e. keypoints were truncated. The
    reference has no cap at all (slab growth, immacros.h:199-222), so
    truncation must be reported - the batch analog of the fused
    single-volume path's overflow flag (api.py).
    """
    from ..features import detect as detect_mod
    from ..features import extrema as extrema_mod
    from .shard_extrema import level_extrema_sharded

    sd = _SPATIAL_DIMS[shard_dim]
    scaled = jax.vmap(pyr_mod.im_scale)(vols.astype(jnp.float32))
    gpyr_b = build_gpyr_batched(scaled, plan, mesh, pipelined=pipelined,
                                shard_dim=shard_dim)
    # DoG is an elementwise subtraction: stays spatially sharded.
    dog_b = pyr_mod.build_dog(gpyr_b, plan)

    # Extrema stay sharded (halo 1 + pmax for the relative threshold +
    # scan-order merge) on levels whose sharded extent divides the axis;
    # geometrically tiny deep octaves fall back to replicated compute.
    n_space = mesh.shape["space"]
    ext = {}
    for o, s in detect_mod.kp_levels(plan):
        cap = detect_mod.level_cap(plan, o, params)
        n_o = dog_b[(o, s)].shape[1 + sd]
        if n_space > 1 and n_o % n_space == 0 and n_o // n_space >= 2:
            ext[(o, s)] = level_extrema_sharded(
                dog_b[(o, s - 1)], dog_b[(o, s)], dog_b[(o, s + 1)],
                params.peak_thresh, cap, mesh, shard_dim=shard_dim)
        else:
            ext[(o, s)] = jax.vmap(
                lambda p, c, n: extrema_mod.level_extrema(
                    p, c, n, params.peak_thresh, cap))(
                dog_b[(o, s - 1)], dog_b[(o, s)], dog_b[(o, s + 1)])

    caps = {k: detect_mod.level_cap(plan, k[0], params) for k in ext}
    # Per-volume truncation flag: any level's unclamped extrema count
    # above its contract cap means rows were dropped.
    kp_overflow = functools.reduce(
        jnp.logical_or,
        [ext[k][2] > caps[k] for k in ext])

    if n_space <= 1:
        # Pure data parallelism: windowed stages vmapped per volume.
        rep = NamedSharding(mesh, P("data", None, None, None))
        gpyr_b = {k: jax.lax.with_sharding_constraint(v, rep)
                  for k, v in gpyr_b.items()}

        def one_volume(gpyr, ext_v):
            kp = detect_mod.orient_levels(gpyr, ext_v, caps, plan, params)
            desc = extract_descriptors(gpyr, kp, plan, params)
            return kp, desc

        kp, desc = jax.vmap(one_volume)(gpyr_b, ext)
        return kp, desc, kp_overflow

    kp, desc = _windows_sharded(gpyr_b, ext, caps, plan, params, mesh,
                                shard_dim)
    return kp, desc, kp_overflow


def _windows_sharded(gpyr_b: dict, ext: dict, caps: dict, plan,
                     params: SIFT3DParams, mesh: Mesh,
                     shard_dim: str = "z"):
    """Orientation + descriptors with windows partitioned over the
    ``shard_dim`` spatial axis (SURVEY §5.7 back half; shard_windows
    partial-sum + psum design).

    Levels whose sharded extent does not divide the "space" axis (the
    tiny deep octaves) fall back to replicated vmapped compute; the
    selection is static per level.
    """
    from ..features import detect as detect_mod
    from ..features.descriptor import Descriptors, extract_level
    from ..features.keypoints import concatenate as kp_concat
    from ..features.orientation import assign_orientations_level
    from ..dtypes import f64 as _f64
    from .shard_windows import descrip_level_sharded, orient_level_sharded

    sd = _SPATIAL_DIMS[shard_dim]
    n_space = mesh.shape["space"]
    rep = NamedSharding(mesh, P("data", None, None, None))

    def shardable(level_key):
        n_o = gpyr_b[level_key].shape[1 + sd]
        return n_o % n_space == 0 and n_o // n_space >= 2

    # --- orientation, level by level, then compact + concatenate ---
    buckets = []
    for o, s in detect_mod.kp_levels(plan):
        zyx_b, count_b = ext[(o, s)][:2]
        cap = caps[(o, s)]
        zyx_b = zyx_b[:, :cap]
        count_b = jnp.minimum(count_b, cap)
        geom = plan.gpyr_level(o, s)
        units_o = plan.octave_units(o)
        if shardable((o, s)):
            R_b, valid_b = orient_level_sharded(
                gpyr_b[(o, s)], zyx_b, geom.scale, units_o,
                params.corner_thresh, mesh, shard_dim=shard_dim)
        else:
            lvl = jax.lax.with_sharding_constraint(gpyr_b[(o, s)], rep)
            R_b, valid_b = jax.vmap(
                lambda lv, z: assign_orientations_level(
                    lv, z, geom.scale, units_o, params.corner_thresh))(
                lvl, zyx_b)
        buckets.append(jax.vmap(
            lambda z, c, R, v, _o=o, _s=s, _sd=geom.scale, _cap=cap:
            detect_mod._level_keypoints(z, c, R, v, _o, _s, _sd, _cap))(
            zyx_b, count_b, R_b, valid_b))
    kp = jax.vmap(lambda *bs: kp_concat(list(bs)))(*buckets)

    # --- descriptors: per-level bucket gather -> sharded windows ---
    B = kp.count.shape[0]
    K = kp.x.shape[1]
    vec = jnp.zeros((B, K, 768), jnp.float32)
    valid_b = jax.vmap(lambda k: k.valid_mask())(kp)
    for o, s in detect_mod.kp_levels(plan):
        cap = caps[(o, s)]
        if cap <= 0:
            continue
        geom = plan.gpyr_level(o, s)
        units_o = plan.octave_units(o)

        def bucket(kpv, vmask, _o=o, _s=s, _cap=cap):
            sel = vmask & (kpv.o == _o) & (kpv.s == _s)
            pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
            dest = jnp.where(sel & (pos < _cap), pos, _cap)
            rows = jnp.zeros(_cap + 1, jnp.int32).at[dest].set(
                jnp.arange(K, dtype=jnp.int32))[:_cap]
            n_in = jnp.minimum(pos[-1] + 1, _cap)
            centers = jnp.stack(
                [kpv.z[rows], kpv.y[rows], kpv.x[rows]], -1
            ).astype(jnp.float32)
            return rows, n_in, centers, kpv.R[rows]

        rows_b, n_b, centers_b, Rm_b = jax.vmap(bucket)(kp, valid_b)
        if shardable((o, s)):
            desc_b = descrip_level_sharded(
                gpyr_b[(o, s)], centers_b, Rm_b, geom.scale, units_o,
                mesh, shard_dim=shard_dim)
        else:
            lvl = jax.lax.with_sharding_constraint(gpyr_b[(o, s)], rep)
            desc_b = jax.vmap(
                lambda lv, c, R, n: extract_level(
                    lv, c, R, geom.scale, units_o, count=n))(
                lvl, centers_b, Rm_b, n_b)
        bucket_valid = jnp.arange(cap)[None, :] < n_b[:, None]
        safe_rows = jnp.where(bucket_valid, rows_b, K)
        vec = jax.vmap(
            lambda v, r, d, m: v.at[r].set(
                jnp.where(m[:, None], d, 0), mode="drop"))(
            vec, safe_rows, desc_b, bucket_valid)

    factor = jnp.exp2(kp.o.astype(_f64()))
    xyz = jnp.stack([kp.x * factor, kp.y * factor, kp.z * factor], -1)
    desc = Descriptors(xyz=xyz, sd=kp.sd, vec=vec, count=kp.count)
    return kp, desc


def batch_register_pairs(src_vols: jax.Array, ref_vols: jax.Array,
                         plan, params: SIFT3DParams, mesh: Mesh,
                         units=(1.0, 1.0, 1.0),
                         match_params: MatchParams = MatchParams(),
                         ransac_params: RansacParams = RansacParams(),
                         pipelined: bool = False):
    """Register B volume pairs in parallel (BASELINE.json config 4).

    Returns a RegistrationResult pytree with leading batch axis; affine
    A[b] maps ref_vols[b] voxel coords onto src_vols[b] voxel coords.
    ``result.kp_overflow[b]`` is True where either volume of pair b lost
    keypoints to the per-level contract cap (see batch_detect_describe).
    """
    import dataclasses

    from ..register.pipeline import register_pair

    _, desc_src, ov_src = batch_detect_describe(src_vols, plan, params,
                                                mesh, pipelined=pipelined)
    _, desc_ref, ov_ref = batch_detect_describe(ref_vols, plan, params,
                                                mesh, pipelined=pipelined)

    def one_pair(ds, dr):
        return register_pair(ds, dr, units, units, match_params,
                             ransac_params)

    res = jax.vmap(one_pair)(desc_src, desc_ref)
    return dataclasses.replace(res, kp_overflow=ov_src | ov_ref)
