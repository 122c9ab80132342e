"""Config-3 benchmark: dense descriptor field throughput (512^3).

Runs the denseSift3D-equivalent path (smooth/scale -> per-voxel gradient
-> barycentric splat -> 12-channel Gaussian smoothing -> per-voxel
postprocess; SURVEY §3.3, reference sift3d/sift.c:2354-2496) on a
synthetic volume and reports voxels/second. The 12-channel blur rides
the dense-matmul conv formulation: bench_conv_crossover measured the
matmul FASTER than the framed-banded path at every size through 512
on the real chip (see ops.conv.BANDED_MIN_N), so O(n) MACs/voxel/axis
is the right trade here despite the FLOP count.

Usage: python benches/bench_dense.py [n] [--check]
  n        cube edge (default 512 - the BASELINE.json config-3 size)
  --check  also run the C oracle's dense path on the same volume
           (very slow at 512^3; use a smaller n with --check)

Prints ONE JSON line on stdout; diagnostics on stderr.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

BASELINES = {
    # C reference v1.4.6 dense path, this host single core, measured via
    # tests/oracle (BASELINE.md round 3).
    128: 6.516e4,   # 32.18 s
    512: 4.318e4,   # 3108.63 s (BASELINE.md round 3)
}


def main():
    import jax
    import jax.numpy as jnp

    n = 512
    check = False
    for a in sys.argv[1:]:
        if a == "--check":
            check = True
        else:
            n = int(a)
    shape = (n, n, n)

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benches.data import make_volume
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.features.dense import extract_dense_descriptors
    from sift3d_tpu.utils import roofline

    from bench import devices_or_die
    devices_or_die(jax)      # fail fast if the tunnel is down
    params = SIFT3DParams()
    print(f"generating {shape} volume ...", file=sys.stderr, flush=True)
    vol = make_volume(shape, nblob=max(60, n // 2), seed=7)
    volj = jnp.asarray(vol)

    fn = jax.jit(lambda v: extract_dense_descriptors(
        v, units=(1.0, 1.0, 1.0), params=params))

    out = jax.block_until_ready(fn(volj))       # warm-up / compile
    assert np.isfinite(np.asarray(out[:, :2, :2, :2])).all()
    # Release the warm-up result: at 512^3 the (12, V) output is 6 GB,
    # and holding it across a timed call double-buffers the output on a
    # 16 GB chip (observed runtime OOM, round 4).
    del out

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(volj))
        times.append(time.perf_counter() - t0)
    t = min(times)
    voxels_per_s = (n ** 3) / t

    # Roofline: input blur (1 ch) + splat + 12-channel blur + postproc.
    taps = 13                        # ~sigma0*desc_sig_fctr/4 band width
    vox = float(n) ** 3
    cost = roofline.StageCost(
        bytes_moved=(2 * 4 * vox) * 3            # input smooth, 3 axes
        + 4 * vox + 12 * 4 * vox                 # splat read + write
        + (2 * 12 * 4 * vox) * 3                 # 12-chan blur, 3 axes
        + 2 * 12 * 4 * vox,                      # postprocess r+w
        flops=vox * (2 * taps * 3) * 13 + vox * 120)
    roof = list(roofline.roofline_report({"dense": t}, {"dense": cost}))
    for rec in roof:
        print(json.dumps(rec), file=sys.stderr, flush=True)

    checked = False
    if check:
        # Re-materialize the field (the warm-up result was deleted above
        # to avoid double-buffering 6 GB on the 16 GB chip).
        checked = _oracle_check(vol, fn, volj, n)

    base = BASELINES.get(n)
    result = {
        "metric": f"dense_descriptor_voxels_per_s_{n}",
        "value": round(voxels_per_s, 1),
        "unit": "voxel/s",
        "vs_baseline": round(voxels_per_s / base, 3) if base else None,
    }
    from benches.persist import record_last_good
    record_last_good(result, roofline=roof, extra={
        "checked_vs_oracle": checked,
        "times_s": [round(x, 4) for x in times],
    })
    print(json.dumps(result))


def _oracle_check(vol, fn, volj, n) -> bool:
    """Compare the TPU field against the C oracle: a cached golden
    artifact when one exists for this size (VERDICT r4 #7 - the 512^3
    C run costs ~52 min, paid once by benches/make_dense_golden.py),
    else a live oracle run."""
    import jax
    import json as _json

    from benches.make_dense_golden import STRIDE, golden_path

    gp = golden_path(n)
    if os.path.exists(gp):
        g = np.load(gp, allow_pickle=False)
        meta = _json.loads(str(g["meta"][0]))
        out = fn(volj)
        # Small D2H pulls: the stride-8 subsample (~12 MB) + per-channel
        # means, never the full 6 GB field.
        sub = np.asarray(out[:, ::STRIDE, ::STRIDE, ::STRIDE])
        # In-place axis reduction: reshape(12, -1) relayouts the 6 GB
        # field and OOMs the 16 GB chip next to the live output.
        ch_mean = np.asarray(out.mean(axis=(1, 2, 3)))
        del out
        np.testing.assert_allclose(sub, g["sub"], atol=2e-3)
        np.testing.assert_allclose(ch_mean, g["ch_mean"], atol=2e-3)
        print(f"dense field matches the cached C golden (2e-3; "
              f"subsample stride {meta['stride']}, full-volume channel "
              f"means; C run {meta['c_seconds']:.0f}s, sha256 "
              f"{meta['sha256_full'][:12]}...)", file=sys.stderr)
        return True
    sys.path.insert(0, os.path.join(_REPO, "tests"))
    from oracle import get
    orc = get()
    if orc is None:
        print("oracle unavailable; skipping check", file=sys.stderr)
        return False
    t0 = time.perf_counter()
    ref = orc.dense(vol)
    tc = time.perf_counter() - t0
    print(f"C reference dense: {tc:.2f} s = {n ** 3 / tc:.3e} vox/s",
          file=sys.stderr, flush=True)
    ours = np.asarray(fn(volj))
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=2e-3)
    print("dense field matches the C reference (2e-3)", file=sys.stderr)
    return True


if __name__ == "__main__":
    main()
