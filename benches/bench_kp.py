"""Headline benchmark: end-to-end keypoint+descriptor throughput.

Runs the kpSift3D-equivalent pipeline (scale-space -> DoG -> extrema ->
orientation -> descriptors; SURVEY §3.1) on a synthetic 128^3 volume and
reports voxels/second through the full pipeline (host input -> device ->
padded descriptor set), steady state, min of 10 timed runs (the tunneled
TPU adds up to 2x run-to-run jitter; BASELINE.md cites this protocol).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C implementation (bbrister/SIFT3D v1.4.6, -O3,
OpenMP), measured on this machine's CPU via the test oracle on the same
volume: 9.04 s for 128^3 detect+extract = 2.32e5 voxel/s (single core;
both implementations find the same 25 keypoints). See BASELINE.md. The
reference publishes no numbers of its own.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_VOXELS_PER_S = 2.32e5   # C reference, this host, 128^3 (BASELINE.md)

SHAPE = (128, 128, 128)


def make_vol(shape_zyx, seed=7):
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape_zyx
    z, y, x = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                          indexing="ij")
    vol = np.zeros(shape_zyx, np.float64)
    for _ in range(120):
        cz, cy, cx = rng.uniform(0, nz), rng.uniform(0, ny), rng.uniform(0, nx)
        sig = rng.uniform(1.2, 4.0)
        vol += rng.uniform(-1, 1) * np.exp(
            -((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2) / (2 * sig * sig))
    return vol.astype(np.float32)


def main():
    import jax

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift3d_tpu.api import Sift3D
    from sift3d_tpu.config import SIFT3DParams

    sift = Sift3D(SIFT3DParams(max_kp_per_level=4096))
    vol = make_vol(SHAPE)

    def run():
        kp, desc = sift.detect_and_extract(vol)
        jax.block_until_ready(desc.vec)
        return desc

    desc = run()                    # warm-up / compile
    assert int(desc.count) > 0

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times)   # min-of-10: the tunneled TPU adds run-to-run jitter
    nz, ny, nx = SHAPE
    voxels_per_s = (nz * ny * nx) / t

    print(json.dumps({
        "metric": "kp_pipeline_voxels_per_s",
        "value": round(voxels_per_s, 1),
        "unit": "voxel/s",
        "vs_baseline": round(voxels_per_s / BASELINE_VOXELS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
