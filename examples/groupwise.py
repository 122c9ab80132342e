"""Groupwise registration of several volumes (new TPU-native capability).

Jointly estimates one affine per volume, consistent across all pairwise
matches, via a distributed normal-equation reduction (see
sift3d_tpu/register/groupwise.py).

Usage: python examples/groupwise.py vol0.nii vol1.nii vol2.nii ...
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from sift3d_tpu.api import Sift3D
from sift3d_tpu.features.descriptor import Descriptors
from sift3d_tpu.io import im_read
from sift3d_tpu.register import register_groupwise


def main(paths) -> int:
    if len(paths) < 2:
        print("need at least 2 volumes", file=sys.stderr)
        return 1
    sift = Sift3D()
    descs, units = [], None
    for p in paths:
        vol = im_read(p)
        units = units or vol.units
        kp = sift.detect(vol)
        descs.append(sift.extract(kp))
        print(f"{p}: {int(kp.count)} keypoints")

    cap = max(d.capacity for d in descs)

    def pad(d):
        def f(x):
            w = [(0, cap - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, w)
        return Descriptors(xyz=f(d.xyz), sd=f(d.sd), vec=f(d.vec),
                           count=d.count)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *[pad(d) for d in descs])

    # Star graph on volume 0 plus a chain for redundancy.
    n = len(paths)
    edges = [(0, i) for i in range(1, n)] + \
            [(i, i + 1) for i in range(1, n - 1)]
    res = register_groupwise(batch, np.asarray(edges), units)
    if not bool(res.ok):
        print("groupwise registration failed (weak edges?)", file=sys.stderr)
        print("edge inliers:", np.asarray(res.edge_inliers))
        return 1
    for i, p in enumerate(paths):
        print(f"A[{i}] ({p} -> {paths[0]} frame):")
        print(np.asarray(res.A[i]))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
