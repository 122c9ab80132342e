"""Headline benchmark: batched pairwise registration throughput.

BASELINE.json config 4: register a batch of 64 synthetic volume pairs
(64^3 blob volumes, ref = src translated by 3 voxels along x) end to end
- pyramid -> extrema -> orientation -> Pallas descriptors for both sides,
MXU matching with forward-backward check, batched RANSAC - as ONE jitted
program, data-parallel over the available devices (one chip here; the
same program shards over a multi-chip mesh via parallel.pipeline).

Metric: registered pairs/second, steady state, min of 5 timed batch runs
(the tunneled TPU adds run-to-run jitter). A quality gate asserts the
recovered translation is within 1 voxel of ground truth on at least 90%
of pairs (BASELINE.json: <1 voxel transform error).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C implementation (bbrister/SIFT3D v1.4.6, -O3,
OpenMP), measured on this machine via the test oracle on one identical
pair: 5.40 s/pair = 0.185 pairs/s (single core; see BASELINE.md). The
reference publishes no numbers of its own. The per-volume keypoint
pipeline benchmark (config 2) lives in benches/bench_kp.py.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 0.185   # C reference, this host, 64^3 (BASELINE.md)

B = 64
SHAPE = (64, 64, 64)
SHIFT = 3                      # voxels along x; A_true = [I | (-3, 0, 0)]


def make_pairs(batch, shape_zyx, seed=11):
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape_zyx
    z, y, x = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                          indexing="ij")
    src = np.zeros((batch,) + shape_zyx, np.float32)
    for b in range(batch):
        vol = np.zeros(shape_zyx, np.float64)
        for _ in range(100):
            cz, cy, cx = (rng.uniform(0, nz), rng.uniform(0, ny),
                          rng.uniform(0, nx))
            sig = rng.uniform(1.5, 4.0)
            vol += rng.uniform(-1, 1) * np.exp(
                -((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                / (2 * sig * sig))
        src[b] = vol.astype(np.float32)
    ref = np.roll(src, SHIFT, axis=3)   # ref(x) = src(x - SHIFT)
    return src, ref


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.pipeline import batch_register_pairs

    # Static per-level capacity: the batch path's one-program contract.
    params = SIFT3DParams(max_kp_per_level=64)
    plan = pyr_mod.plan_pyramid(SHAPE, (1.0, 1.0, 1.0), params)
    devs = jax.devices()
    mesh = make_mesh(devs, data=len(devs), space=1)

    src, ref = make_pairs(B, SHAPE)
    srcj, refj = jnp.asarray(src), jnp.asarray(ref)

    fn = jax.jit(lambda s, r: batch_register_pairs(s, r, plan, params,
                                                   mesh))

    def run():
        res = fn(srcj, refj)
        return np.asarray(res.A), np.asarray(res.ok)

    A, ok = run()                       # warm-up / compile
    # Quality gate: recovered translation within 1 voxel, >= 90% of pairs.
    t_err = np.abs(A[:, 0, 3] + SHIFT) + np.abs(A[:, 1, 3]) + \
        np.abs(A[:, 2, 3])
    lin_err = np.abs(A[:, :, :3] - np.eye(3)).max(axis=(1, 2))
    good = ok & (t_err < 1.0) & (lin_err < 0.1)
    assert good.mean() >= 0.9, \
        f"quality gate: {good.mean():.0%} pairs within 1 voxel"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times)   # min-of-5: the tunneled TPU adds run-to-run jitter
    pairs_per_s = B / t

    print(json.dumps({
        "metric": "registered_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pair/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
