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


def _z_shardable(taps, unit: float, unit_z: float, nz: int,
                 n_space: int) -> bool:
    """Whether a z-sharded halo conv is valid for this filter/extent."""
    if n_space <= 1:
        return False
    if nz % n_space:
        return False
    W = conv.conv_matrix(np.asarray(taps, np.float32), unit, unit_z, nz)
    rows, cols = np.nonzero(W)
    H = int(np.max(np.abs(cols - rows))) if len(rows) else 0
    return H <= nz // n_space


def _conv_level(vols, taps, units_o, mesh):
    """One blur of a (B, nz, ny, nx) batch: sharded z pass when possible."""
    nz = vols.shape[1]
    if _z_shardable(taps, 1.0, units_o[2], nz, mesh.shape["space"]):
        return conv_sep_sharded(vols, taps, 1.0, units_o, mesh)
    out = conv.conv_sep(vols, taps, 1.0, units_o)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("data", None, None, None)))


def build_gpyr_batched(vols: jax.Array, plan, mesh: Mesh) -> dict:
    """Batched GSS pyramid: {(o, s): (B, nz, ny, nx)}.

    Mirrors pyramid.build_gpyr level-for-level; the input batch must already
    be scaled to [-1, 1] per volume.
    """
    first = plan.first_level
    last = plan.last_gpyr_level
    levels: dict = {}
    for o in range(plan.num_octaves):
        units_o = plan.octave_units(o)
        if o == 0:
            levels[(o, first)] = _conv_level(vols, plan.first_gauss_taps(),
                                             units_o, mesh)
        else:
            src = levels[(o - 1, plan.downsample_level)]
            nxd, nyd, nzd = plan.octave_dims(o)
            down = src[:, ::2, ::2, ::2][:, :nzd, :nyd, :nxd]
            levels[(o, first)] = jax.lax.with_sharding_constraint(
                down, NamedSharding(mesh, P("data", None, None, None)))
        for s in range(first + 1, last + 1):
            levels[(o, s)] = _conv_level(levels[(o, s - 1)],
                                         plan.octave_filter_taps(s),
                                         units_o, mesh)
    return levels


def batch_detect_describe(vols: jax.Array, plan, params: SIFT3DParams,
                          mesh: Mesh):
    """Detect + describe a batch of volumes: DP over "data", SP over "space".

    Args:
      vols: (B, nz, ny, nx) raw volumes (one shape per plan).

    Returns (keypoints, descriptors) pytrees with a leading batch axis.
    """
    from ..features import detect as detect_mod
    from ..features import extrema as extrema_mod
    from .shard_extrema import level_extrema_sharded

    scaled = jax.vmap(pyr_mod.im_scale)(vols.astype(jnp.float32))
    gpyr_b = build_gpyr_batched(scaled, plan, mesh)
    # DoG is an elementwise subtraction: stays z-sharded.
    dog_b = pyr_mod.build_dog(gpyr_b, plan)

    # Extrema stay z-sharded (halo 1 + pmax for the relative threshold +
    # scan-order merge) on levels whose z extent divides the axis;
    # geometrically tiny deep octaves fall back to replicated-z.
    n_space = mesh.shape["space"]
    ext = {}
    for o, s in detect_mod.kp_levels(plan):
        cap = detect_mod.level_cap(plan, o, params)
        nz_o = dog_b[(o, s)].shape[1]
        if n_space > 1 and nz_o % n_space == 0 and nz_o // n_space >= 2:
            ext[(o, s)] = level_extrema_sharded(
                dog_b[(o, s - 1)], dog_b[(o, s)], dog_b[(o, s + 1)],
                params.peak_thresh, cap, mesh)
        else:
            ext[(o, s)] = jax.vmap(
                lambda p, c, n: extrema_mod.level_extrema(
                    p, c, n, params.peak_thresh, cap))(
                dog_b[(o, s - 1)], dog_b[(o, s)], dog_b[(o, s + 1)])

    # Windowed feature stages run data-parallel on replicated-z levels.
    rep = NamedSharding(mesh, P("data", None, None, None))
    gpyr_b = {k: jax.lax.with_sharding_constraint(v, rep)
              for k, v in gpyr_b.items()}

    caps = {k: detect_mod.level_cap(plan, k[0], params) for k in ext}

    def one_volume(gpyr, ext_v):
        kp = detect_mod.orient_levels(gpyr, ext_v, caps, plan, params)
        desc = extract_descriptors(gpyr, kp, plan, params)
        return kp, desc

    return jax.vmap(one_volume)(gpyr_b, ext)


def batch_register_pairs(src_vols: jax.Array, ref_vols: jax.Array,
                         plan, params: SIFT3DParams, mesh: Mesh,
                         units=(1.0, 1.0, 1.0),
                         match_params: MatchParams = MatchParams(),
                         ransac_params: RansacParams = RansacParams()):
    """Register B volume pairs in parallel (BASELINE.json config 4).

    Returns a RegistrationResult pytree with leading batch axis; affine
    A[b] maps ref_vols[b] voxel coords onto src_vols[b] voxel coords.
    """
    from ..register.pipeline import register_pair

    _, desc_src = batch_detect_describe(src_vols, plan, params, mesh)
    _, desc_ref = batch_detect_describe(ref_vols, plan, params, mesh)

    def one_pair(ds, dr):
        return register_pair(ds, dr, units, units, match_params,
                             ransac_params)

    return jax.vmap(one_pair)(desc_src, desc_ref)
