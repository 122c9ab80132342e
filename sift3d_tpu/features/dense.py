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


def _interior_grad_bin(smooth: jax.Array, units):
    """Per-voxel unit-corrected gradient at interior voxels [1, n-2]
    only (sift.c:2442-2447), icosahedrally binned. Returns
    (face, bary, ok) with boundary voxels masked out of ``ok``."""
    from .windows import window_gradients

    gi = window_gradients(smooth, units)        # core = interior voxels
    grad = jnp.zeros(smooth.shape + (3,), jnp.float32)
    for a, g in enumerate(gi):
        grad = grad.at[1:-1, 1:-1, 1:-1, a].set(g)
    interior = jnp.zeros(smooth.shape, bool).at[1:-1, 1:-1, 1:-1].set(True)
    face, bary, ok = icos_hist_bin(grad)
    return face, bary, ok & interior


def _bary_splat(smooth: jax.Array,
                units: tuple[float, float, float]) -> jax.Array:
    """(12, nz, ny, nx) barycentric vertex weights per voxel."""
    face, bary, ok = _interior_grad_bin(smooth, units)
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


def _dense_hist_window(smooth, center_zyx, R, radii, cores, units,
                       sigma: float, rad: float) -> jax.Array:
    """One voxel's rotation-invariant 12-bin histogram
    (extract_dense_descrip_rotate, reference sift.c:2295-2343):
    sphere window of radius ``rad`` (mm), unit-corrected gradients
    rotated by R^T for binning, magnitude x Gaussian weight accumulated
    into the face's 3 vertex bins."""
    from .windows import gather_window, window_gradients

    ux, uy, uz = (np.float32(u) for u in units)
    bz, by, bx = (center_zyx[i].astype(jnp.int32) for i in range(3))
    win, (sz, sy, sx) = gather_window(smooth, (bz, by, bx), radii, cores)
    ckz, cky, ckx = cores

    zg = (sz + jnp.arange(ckz, dtype=jnp.int32))[:, None, None]
    yg = (sy + jnp.arange(cky, dtype=jnp.int32))[None, :, None]
    xg = (sx + jnp.arange(ckx, dtype=jnp.int32))[None, None, :]
    vx = (xg - bx).astype(jnp.float32) * ux
    vy = (yg - by).astype(jnp.float32) * uy
    vz = (zg - bz).astype(jnp.float32) * uz
    sq = vx * vx + vy * vy + vz * vz
    rad32 = jnp.float32(rad)
    mask = sq <= rad32 * rad32

    gx, gy, gz = window_gradients(win, units)
    sig32 = jnp.float32(sigma)
    w = jnp.exp(jnp.float32(-0.5) * sq / (sig32 * sig32))

    Rt = R.T.astype(jnp.float32)
    grx = Rt[0, 0] * gx + Rt[0, 1] * gy + Rt[0, 2] * gz
    gry = Rt[1, 0] * gx + Rt[1, 1] * gy + Rt[1, 2] * gz
    grz = Rt[2, 0] * gx + Rt[2, 1] * gy + Rt[2, 2] * gz
    V = gx.size
    grad_rot = jnp.stack([grx.reshape(V), gry.reshape(V),
                          grz.reshape(V)], -1)
    face, bary, ok = icos_hist_bin(grad_rot)
    mag = jnp.sqrt(gx * gx + gy * gy + gz * gz).reshape(V)
    G = vertex_weights(face, bary)                           # (V, 12)
    wgt = (mask.reshape(V) & ok).astype(jnp.float32) * \
        w.reshape(V) * mag
    return jnp.sum(G * wgt[:, None], axis=0)                 # (12,)


def _extract_dense_rotate(vol, smooth, units, params) -> jax.Array:
    """Rotation-invariant dense path (extract_dense_descriptors_rotate,
    reference sift.c:2521-2588): per voxel, assign an orientation with
    sigma = sigma0 * ori_sig_fctr (identity when rejected), then
    accumulate one windowed rotated-gradient histogram with
    sigma = sigma0 * desc_sig_fctr / NHIST_PER_DIM."""
    import math

    from ..config import DESC_RAD_FCTR
    from .orientation import assign_orientations_level, window_radii
    from .windows import window_extent

    nz, ny, nx = smooth.shape
    zi, yi, xi = jnp.meshgrid(jnp.arange(nz, dtype=jnp.int32),
                              jnp.arange(ny, dtype=jnp.int32),
                              jnp.arange(nx, dtype=jnp.int32),
                              indexing="ij")
    coords = jnp.stack([zi.ravel(), yi.ravel(), xi.ravel()], -1)  # (V, 3)

    R, valid = assign_orientations_level(
        smooth, coords, params.sigma0, units, params.corner_thresh)
    eye = jnp.eye(3, dtype=jnp.float32)
    R = jnp.where(valid[:, None, None], R, eye)

    desc_sigma = params.sigma0 * DESC_SIG_FCTR / NHIST_PER_DIM
    rad = DESC_RAD_FCTR * desc_sigma
    radii = window_radii(rad, units)
    Rx, Ry, Rz = radii
    cores = (window_extent(Rz, nz, True), window_extent(Ry, ny, True),
             window_extent(Rx, nx, True))

    def one(args):
        c, r = args
        return _dense_hist_window(smooth, c, r, (Rz, Ry, Rx), cores,
                                  units, float(desc_sigma), float(rad))

    V = coords.shape[0]
    chunk = 128
    pad = (-V) % chunk
    c_p = jnp.concatenate([coords, jnp.ones((pad, 3), coords.dtype)])
    R_p = jnp.concatenate([R, jnp.broadcast_to(eye, (pad, 3, 3))])
    hist = jax.lax.map(
        jax.vmap(one),
        (c_p.reshape(-1, chunk, 3), R_p.reshape(-1, chunk, 3, 3)))
    hist = hist.reshape(-1, HIST_NUMEL)[:V].reshape(nz, ny, nx, HIST_NUMEL)
    out = postproc_hist(hist, vol)
    return jnp.moveaxis(out, -1, 0)


# Above this many voxels the splat-and-blur path switches to the
# channel-sequential formulation: the all-at-once path materializes
# (V, 20) face scores and (V, 12) weights - 10.7 GB + 6.4 GB at 512^3,
# beyond one chip's HBM (BASELINE.json config 3).
DENSE_CHANNEL_SEQ_VOX = 1 << 25


def _splat_compact(smooth: jax.Array, units) -> tuple[jax.Array, jax.Array]:
    """Per-voxel (3,) vertex ids + (3,) barycentric weights - the compact
    form of the 12-channel splat: 24 B/voxel (3 i32 + 3 f32) instead of
    48 (plus the 80 B/voxel 20-channel binning transient)."""
    from ..ops.geometry import face_tables

    face, bary, ok = _interior_grad_bin(smooth, units)
    idx = np.asarray(face_tables()["idx"], np.int32)         # (20, 3)
    # vt_j = idx[face, j] via 20-way select (gather-free); uint8 (values
    # 0-11) keeps the persistent splat state at 1 B/voxel/vertex.
    vt = []
    for j in range(3):
        v = jnp.zeros(smooth.shape, jnp.uint8)
        for f in range(20):
            v = v + jnp.where(face == f, np.uint8(idx[f, j]),
                              np.uint8(0))
        vt.append(v)
    w = bary * ok[..., None].astype(jnp.float32)             # (z, y, x, 3)
    return jnp.stack(vt), jnp.moveaxis(w, -1, 0)             # (3, z, y, x)


def _dense_channels_seq(vol, smooth, units, taps) -> jax.Array:
    """Channel-sequential splat + blur + postprocess: peak memory is the
    (12, V) result + one channel of transients, not the 20-channel
    binning intermediates."""
    vt, w = _splat_compact(smooth, units)

    def one_channel(c):
        w_c = sum(w[j] * (vt[j] == c.astype(jnp.uint8)).astype(jnp.float32)
                  for j in range(3))
        return conv.conv_sep(w_c, taps, 1.0, (1.0, 1.0, 1.0))

    blurred = jax.lax.map(one_channel, jnp.arange(12))       # (12, z, y, x)

    # postproc_Hist (sift.c:2267-2292) with channel-at-a-time reductions.
    trunc = jnp.float32(TRUNC_THRESH) * jnp.float32(DESC_NUMEL / HIST_NUMEL)
    n1 = jnp.sqrt(sum(blurred[c].astype(f64()) ** 2 for c in range(12)))
    inv1 = (1.0 / (n1 + _DBL_EPSILON)).astype(jnp.float32)
    n2 = jnp.sqrt(sum(
        jnp.minimum(blurred[c] * inv1, trunc).astype(f64()) ** 2
        for c in range(12)))
    inv2 = (1.0 / (n2 + _DBL_EPSILON)).astype(jnp.float32) * vol

    # Final scaling overwrites ``blurred`` channel-in-place through a
    # fori_loop carry (dynamic_update_index aliases the buffer), so the
    # (12, V) result never coexists with a second (12, V) source - at
    # 512^3 that double buffer alone is 2 x 6.4 GB.
    def body(c, acc):
        ch = jax.lax.dynamic_index_in_dim(acc, c, 0, keepdims=False)
        new = jnp.minimum(ch * inv1, trunc) * inv2
        return jax.lax.dynamic_update_index_in_dim(acc, new, c, 0)
    return jax.lax.fori_loop(0, 12, body, blurred)


def extract_dense_descriptors(vol: jax.Array,
                              units: tuple[float, float, float] = (1., 1., 1.),
                              params: SIFT3DParams = SIFT3DParams(),
                              ) -> jax.Array:
    """Dense descriptor image (12, nz, ny, nx) float32.

    Channel b holds icosahedral-vertex bin b, matching the reference's
    12-channel output (sift.c:2383-2386). ``params.dense_rotate``
    selects the rotation-invariant path (per-voxel orientation +
    windowed rotated-gradient histograms, sift.c:2521-2588) instead of
    the fast splat-and-blur path.
    """
    if params.dense_rotate:
        vol = vol.astype(jnp.float32)
        smooth = smooth_scale_raw_input(vol, units, params)
        return _extract_dense_rotate(vol, smooth, units, params)
    vol = vol.astype(jnp.float32)
    smooth = smooth_scale_raw_input(vol, units, params)

    sigma_win = params.sigma0 * DESC_SIG_FCTR / NHIST_PER_DIM
    taps = gauss_taps(sigma_win)
    # Reference quirk, reproduced faithfully: the 12-channel image only gets
    # its *dims* copied from the input (sift.c:2383-2386), never its units,
    # so this blur runs at voxel spacing (1,1,1) even for anisotropic
    # volumes - while the gradients above ARE unit-corrected.
    if vol.size >= DENSE_CHANNEL_SEQ_VOX:
        return _dense_channels_seq(vol, smooth, units, taps)
    splat = _bary_splat(smooth, units)
    blurred = conv.conv_sep(splat, taps, 1.0, (1.0, 1.0, 1.0))

    hist = jnp.moveaxis(blurred, 0, -1)                      # (z, y, x, 12)
    out = postproc_hist(hist, vol)
    return jnp.moveaxis(out, -1, 0)
