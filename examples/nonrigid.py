"""Nonrigid (thin-plate-spline) registration - beyond the reference.

The reference declares a TPS transform but never implemented its fit
(imutil.c:4504-4508), so its regSift3D only accepts --type affine. This
framework completes the capability: affine RANSAC rejects outliers, a
TPS interpolates the inlier correspondences, and the source is
pull-warped through the spline.

Usage: python examples/nonrigid.py src.nii ref.nii warped.nii
"""

import sys

import jax.numpy as jnp
import numpy as np

from sift3d_tpu.api import RegSift3D
from sift3d_tpu.io import im_read, im_write
from sift3d_tpu.io.volume import Volume
from sift3d_tpu.register.tps import im_inv_transform_tps


def main(argv):
    src = im_read(argv[0])
    ref = im_read(argv[1])
    reg = RegSift3D()
    result, tps = reg.register_tps(src, ref)
    if tps is None:
        print("no good model was found", file=sys.stderr)
        return 1
    print(f"{len(result.match_src)} matches, {result.num_inliers} "
          f"affine inliers, {tps.ctrl.shape[0]} TPS control points")
    data = src.data[..., 0] if src.data.ndim == 4 else src.data
    warped = np.asarray(im_inv_transform_tps(
        tps, jnp.asarray(data), out_shape_zyx=ref.data.shape[:3],
        src_units=src.units, ref_units=ref.units))
    im_write(argv[2], Volume(warped, ref.units))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
