"""Dense per-voxel descriptors.

Reproduces SIFT3D_extract_dense_descriptors (reference
sift3d/sift.c:2354-2424) in the default no-rotation mode
(extract_dense_descriptors_no_rotate, sift.c:2429-2496):

- smooth the raw input from sigma_n to sigma0 and scale to [-1, 1]
  (smooth_scale_raw_input, sift.c:1978-2006);
- at every interior voxel, take the unit-corrected gradient, find its
  icosahedral face, and write the 3 barycentric weights into the face's
  3 vertex channels of a 12-channel image (unweighted by magnitude;
  boundary voxels and non-intersecting gradients contribute zero);
- blur the 12-channel image with a Gaussian of
  sigma = sigma0 * desc_sig_fctr / NHIST_PER_DIM at unit tap spacing;
- per voxel: normalize -> truncate at trunc_thresh * 64 -> renormalize ->
  multiply by the *raw* input intensity (postproc_Hist, sift.c:2267-2292;
  refine_Hist is a no-op under ICOS_HIST, sift.c:1236-1257).

TPU mapping: the per-voxel scatter is a dense (V, 12) one-hot weighted
gather -> the whole pipeline is elementwise ops + the separable-convolution
matmul kernel, batched over the 12 channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (DESC_NUMEL, DESC_SIG_FCTR, HIST_NUMEL, NHIST_PER_DIM,
                      SIFT3DParams, TRUNC_THRESH)
from ..dtypes import f64
from ..ops import conv
from ..ops.gauss import gauss_taps, incremental_sigma
from ..ops.geometry import icos_hist_bin, vertex_weights
from ..pyramid import im_scale

_DBL_EPSILON = 2.220446049250313e-16


def smooth_scale_raw_input(vol: jax.Array,
                           units: tuple[float, float, float],
                           params: SIFT3DParams) -> jax.Array:
    """sigma_n -> sigma0 blur + scale to [-1, 1] (sift.c:1978-2006)."""
    taps = gauss_taps(incremental_sigma(params.sigma_n, params.sigma0))
    return im_scale(conv.conv_sep(vol.astype(jnp.float32), taps, 1.0, units))


def _bary_splat(smooth: jax.Array,
                units: tuple[float, float, float]) -> jax.Array:
    """(12, nz, ny, nx) barycentric vertex weights per voxel."""
    nz, ny, nx = smooth.shape
    ux, uy, uz = (np.float32(u) for u in units)
    gx = jnp.zeros_like(smooth)
    gy = jnp.zeros_like(smooth)
    gz = jnp.zeros_like(smooth)
    # Interior voxels [1, n-2] only (sift.c:2442-2447).
    gx = gx.at[1:-1, 1:-1, 1:-1].set(
        jnp.float32(0.5) * (smooth[1:-1, 1:-1, 2:] - smooth[1:-1, 1:-1, :-2])
        * (np.float32(1.0) / ux))
    gy = gy.at[1:-1, 1:-1, 1:-1].set(
        jnp.float32(0.5) * (smooth[1:-1, 2:, 1:-1] - smooth[1:-1, :-2, 1:-1])
        * (np.float32(1.0) / uy))
    gz = gz.at[1:-1, 1:-1, 1:-1].set(
        jnp.float32(0.5) * (smooth[2:, 1:-1, 1:-1] - smooth[:-2, 1:-1, 1:-1])
        * (np.float32(1.0) / uz))
    interior = jnp.zeros(smooth.shape, bool).at[1:-1, 1:-1, 1:-1].set(True)

    grad = jnp.stack([gx, gy, gz], -1)                      # (z, y, x, 3)
    face, bary, ok = icos_hist_bin(grad)
    ok = ok & interior
    w = vertex_weights(face, bary)                           # (z, y, x, 12)
    w = w * ok[..., None].astype(jnp.float32)
    return jnp.moveaxis(w, -1, 0)                            # (12, z, y, x)


def postproc_hist(hist: jax.Array, norm: jax.Array) -> jax.Array:
    """Per-voxel normalize -> truncate -> renormalize -> scale
    (postproc_Hist, sift.c:2267-2292). hist: (..., 12); norm: (...)."""
    trunc = jnp.float32(TRUNC_THRESH) * jnp.float32(DESC_NUMEL / HIST_NUMEL)

    def normalize(v):
        n = jnp.sqrt(jnp.sum(v.astype(f64()) ** 2, -1,
                             keepdims=True)) + _DBL_EPSILON
        return v * (1.0 / n).astype(jnp.float32)
    v = normalize(hist)
    v = jnp.minimum(v, trunc)
    v = normalize(v)
    return v * norm[..., None].astype(jnp.float32)


def extract_dense_descriptors(vol: jax.Array,
                              units: tuple[float, float, float] = (1., 1., 1.),
                              params: SIFT3DParams = SIFT3DParams(),
                              ) -> jax.Array:
    """Dense descriptor image (12, nz, ny, nx) float32.

    Channel b holds icosahedral-vertex bin b, matching the reference's
    12-channel output (sift.c:2383-2386). Only the default no-rotation
    path is implemented; dense_rotate=True raises.
    """
    if params.dense_rotate:
        raise NotImplementedError(
            "rotation-invariant dense descriptors are not implemented "
            "(reference extract_dense_descriptors_rotate, sift.c:2521-2588)")
    vol = vol.astype(jnp.float32)
    smooth = smooth_scale_raw_input(vol, units, params)
    splat = _bary_splat(smooth, units)

    sigma_win = params.sigma0 * DESC_SIG_FCTR / NHIST_PER_DIM
    taps = gauss_taps(sigma_win)
    # Reference quirk, reproduced faithfully: the 12-channel image only gets
    # its *dims* copied from the input (sift.c:2383-2386), never its units,
    # so this blur runs at voxel spacing (1,1,1) even for anisotropic
    # volumes - while the gradients above ARE unit-corrected.
    blurred = conv.conv_sep(splat, taps, 1.0, (1.0, 1.0, 1.0))

    hist = jnp.moveaxis(blurred, 0, -1)                      # (z, y, x, 12)
    out = postproc_hist(hist, vol)
    return jnp.moveaxis(out, -1, 0)
