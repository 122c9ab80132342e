"""Pairwise registration pipeline.

Reproduces register_SIFT3D (reference reg/reg.c:239-317): match descriptors,
convert matched coordinates from voxels to real-world mm (im2mm,
reg.c:43-68), fit an affine with RANSAC in mm space, and convert the
transform back to voxel space (mm2im, reg.c:79-117). The returned affine A
(3x4) maps *ref* voxel coordinates to *src* voxel coordinates, exactly like
the reference's output (used by im_inv_transform to pull-warp src onto the
ref grid, cli/regSift3D.c:370-403).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import MatchParams, RansacParams
from ..dtypes import f64
from ..features.descriptor import Descriptors
from ..features.match import matches_to_coords, nn_match
from .ransac import RansacResult, find_tform_ransac


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RegistrationResult:
    A: jax.Array            # (3, 4) affine in voxel space, ref -> src
    matches: jax.Array      # (N_src,) i32 match indices into ref (-1 = none)
    match_src: jax.Array    # (N_src, 3) f64 padded matched src voxel coords
    match_ref: jax.Array    # (N_src, 3) f64 padded matched ref voxel coords
    num_matches: jax.Array  # () i32
    num_inliers: jax.Array  # () i32
    ok: jax.Array           # () bool
    # True when keypoints were truncated at a fixed capacity upstream of
    # the descriptors (batched detect path; the reference's keypoint
    # store is unbounded, immacros.h:199-222, so loss must be surfaced).
    kp_overflow: jax.Array  # () bool


def im2mm(pts: jax.Array, units) -> jax.Array:
    """Voxel -> mm: scale column j by units[j] (reg.c:43-68)."""
    u = jnp.asarray(units, f64())
    return pts.astype(f64()) * u[None, :]


def mm2im(A_mm: jax.Array, src_units, ref_units) -> jax.Array:
    """Convert an affine from mm to voxel space (reg.c:79-117).

    A_im[i, j] = A_mm[i, j] * (ref_units[j] if j < 3 else 1) / src_units[i].
    """
    ru = jnp.concatenate([jnp.asarray(ref_units, f64()),
                          jnp.ones((1,), f64())])
    su = jnp.asarray(src_units, f64())
    return A_mm * ru[None, :] / su[:, None]


def register_pair(desc_src: Descriptors, desc_ref: Descriptors,
                  src_units, ref_units,
                  match_params: MatchParams = MatchParams(),
                  ransac_params: RansacParams = RansacParams(),
                  ssd_dtype=jnp.float32) -> RegistrationResult:
    """Register a (src, ref) descriptor pair.

    Conventions follow the reference: ``desc_src`` plays d1 (queries) and
    ``desc_ref`` plays d2 in matching (reg.c:271), and the fit maps ref
    coordinates onto src coordinates.
    """
    n1, n2 = desc_src.vec.shape[0], desc_ref.vec.shape[0]
    use_streamed = match_params.impl == "streamed" or (
        match_params.impl == "auto" and
        n1 * n2 >= match_params.streamed_threshold and
        jax.default_backend() == "tpu")
    if use_streamed:
        from ..ops.pallas_match import nn_match_streamed
        matches = nn_match_streamed(
            desc_src.vec, desc_ref.vec, match_params.nn_thresh,
            valid1=desc_src.valid_mask(), valid2=desc_ref.valid_mask(),
            # Off-TPU (explicit impl="streamed" in tests) runs interpreted.
            interpret=jax.default_backend() != "tpu")
    else:
        matches = nn_match(desc_src.vec, desc_ref.vec,
                           match_params.nn_thresh,
                           valid1=desc_src.valid_mask(),
                           valid2=desc_ref.valid_mask(),
                           dtype=ssd_dtype)
    src_xyz, ref_xyz, n_match = matches_to_coords(
        desc_src.xyz, desc_ref.xyz, matches)

    src_mm = im2mm(src_xyz, src_units)
    ref_mm = im2mm(ref_xyz, ref_units)
    res: RansacResult = find_tform_ransac(src_mm, ref_mm, n_match,
                                          ransac_params)
    A_im = mm2im(res.A, src_units, ref_units)
    return RegistrationResult(
        A=A_im, matches=matches, match_src=src_xyz, match_ref=ref_xyz,
        num_matches=n_match, num_inliers=res.num_inliers, ok=res.ok,
        kp_overflow=jnp.zeros((), bool))


def register_pair_tps(desc_src: Descriptors, desc_ref: Descriptors,
                      src_units, ref_units,
                      match_params: MatchParams = MatchParams(),
                      ransac_params: RansacParams = RansacParams(),
                      reg: float = 1e-6):
    """Nonrigid registration: affine RANSAC for outlier rejection, then a
    thin-plate spline fit on the inlier correspondences.

    A capability the reference declares but never implemented (its
    solve_system rejects TPS, imutil.c:4504-4508; the regSift3D CLI only
    accepts ``--type affine``). The returned TPS maps ref mm coordinates
    to src mm coordinates - warp with
    :func:`..register.tps.im_inv_transform_tps`.

    Host-level (not jittable): the TPS system size is the data-dependent
    inlier count. Returns (RegistrationResult, Tps | None) - None when
    the affine stage found no model.
    """
    import numpy as np

    from .tps import fit_tps

    res = register_pair(desc_src, desc_ref, src_units, ref_units,
                        match_params, ransac_params)
    if not bool(res.ok):
        return res, None
    # Re-run the (deterministic, counter-based) RANSAC on the mm points
    # to get the final mm-space affine's inlier mask directly, instead
    # of hand-inverting mm2im's scaling.
    src_mm = im2mm(res.match_src, src_units)
    ref_mm = im2mm(res.match_ref, ref_units)
    rres = find_tform_ransac(src_mm, ref_mm, res.num_matches,
                             ransac_params)
    n = int(res.num_matches)
    inl = np.asarray(rres.inlier_mask)[:n]
    if inl.sum() < 5:
        return res, None
    tps = fit_tps(jnp.asarray(np.asarray(ref_mm)[:n][inl]),
                  jnp.asarray(np.asarray(src_mm)[:n][inl]), reg=reg)
    return res, tps
