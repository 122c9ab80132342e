"""Config-2 benchmark: end-to-end keypoint+descriptor throughput.

Runs the kpSift3D-equivalent pipeline (scale-space -> DoG -> extrema ->
orientation -> descriptors; SURVEY §3.1) on a synthetic volume and
reports voxels/second through the full pipeline (host input -> device ->
padded descriptor set), steady state, min of 10 timed runs (the tunneled
TPU adds up to 2x run-to-run jitter; BASELINE.md cites this protocol).
Also prints a per-stage roofline (utils/roofline.py): achieved GB/s and
FLOP/s vs TPU v5e peaks, from analytic useful-work counts.

Usage: python benches/bench_kp.py [n] [--check]
  n        cube edge (default 256 - the BASELINE.json config-2 size;
           round 1 measured 128)
  --check  also run the C oracle on the same volume and verify row-exact
           keypoint agreement (slow: the reference needs ~70 s at 256^3)

Prints ONE JSON line on stdout; diagnostics on stderr.

Baselines (C reference v1.4.6, -O3 + OpenMP, this host's single core,
measured via tests/oracle): 128^3 blobs: 9.04 s = 2.32e5 vox/s
(round 1); 256^3 ellipsoid volume: measured by --check runs and recorded
in BASELINE.md.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

BASELINES = {
    128: 2.32e5,    # measured round 1 (BASELINE.md)
    256: 2.046e5,   # measured round 3 (81.99 s, 146 kp; BASELINE.md)
}


def main():
    import jax

    n = 256
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
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.api import Sift3D
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.utils import roofline

    from bench import devices_or_die
    devices_or_die(jax)      # fail fast if the tunnel is down
    params = SIFT3DParams(max_kp_per_level=4096)
    sift = Sift3D(params)
    print(f"generating {shape} volume ...", file=sys.stderr, flush=True)
    vol = make_volume(shape, nblob=max(60, n), seed=7)

    def run():
        kp, desc = sift.detect_and_extract(vol)
        jax.block_until_ready(desc.vec)
        return kp, desc

    kp, desc = run()                # warm-up / compile
    n_kp = int(kp.count)
    assert n_kp > 0
    print(f"{n_kp} keypoints", file=sys.stderr, flush=True)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times)   # min-of-10: the tunneled TPU adds run-to-run jitter
    voxels_per_s = (n ** 3) / t

    # Per-stage roofline: time the H2D transfer and the dense stage-A
    # program (pyramid -> DoG -> extrema) at their real seams; the
    # orientation/descriptor windows + host bucketing are the remainder.
    import jax.numpy as jnp
    from sift3d_tpu.api import _extrema_fn

    def tmin(f, reps=5):
        f()
        return min(_timed(f) for _ in range(reps))

    def _timed(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    t_h2d = tmin(lambda: jax.block_until_ready(jnp.asarray(vol)))
    fnA, plan = _extrema_fn(shape, (1.0, 1.0, 1.0), params)
    volj = jnp.asarray(vol)
    t_a = tmin(lambda: jax.block_until_ready(fnA(volj)[2]))
    dense_cost = roofline.pyramid_cost(plan) + roofline.extrema_cost(plan)
    costs = {
        "h2d": roofline.StageCost(bytes_moved=vol.nbytes),
        "pyramid+dog+extrema": dense_cost,
        "windows+host": roofline.descriptor_cost(n_kp, 17.0 ** 3),
        "total": dense_cost + roofline.descriptor_cost(n_kp, 17.0 ** 3),
    }
    secs = {"h2d": t_h2d, "pyramid+dog+extrema": t_a, "total": t}
    # The windows+host remainder is only meaningful when the seams don't
    # overlap (the fused program streams H2D behind compute, so the
    # remainder can come out ~zero or negative - skip it then).
    if t - t_a - t_h2d > 1e-3:
        secs["windows+host"] = t - t_a - t_h2d
    roof = list(roofline.roofline_report(secs, costs))
    for rec in roof:
        print(json.dumps(rec), file=sys.stderr, flush=True)

    if check:
        _oracle_check(vol, kp, n)

    base = BASELINES.get(n)
    result = {
        "metric": f"kp_pipeline_voxels_per_s_{n}",
        "value": round(voxels_per_s, 1),
        "unit": "voxel/s",
        "vs_baseline": round(voxels_per_s / base, 3) if base else None,
    }
    from benches.persist import record_last_good
    record_last_good(result, roofline=roof, extra={
        "n_kp": n_kp, "checked_vs_oracle": check,
        "times_s": [round(x, 4) for x in times],
    })
    print(json.dumps(result))


def _oracle_check(vol, kp, n):
    """Row-exact keypoint agreement with the C reference + C timing."""
    sys.path.insert(0, os.path.join(_REPO, "tests"))
    from oracle import get
    orc = get()
    if orc is None:
        print("oracle unavailable; skipping bit-check", file=sys.stderr)
        return
    t0 = time.perf_counter()
    rows_c = orc.detect(vol)
    orc.extract()
    tc = time.perf_counter() - t0
    print(f"C reference: {tc:.2f} s = {n ** 3 / tc:.3e} vox/s, "
          f"{len(rows_c)} keypoints", file=sys.stderr, flush=True)
    ours = kp.to_numpy()
    assert len(rows_c) == len(ours), (len(rows_c), len(ours))
    # Row-exact contract: coords/octave/scale identical, R to 1e-3
    # (PARITY.md #19-20). Sort includes sd so co-located keypoints at
    # different scales pair up deterministically.
    a = ours[np.lexsort(ours[:, :5].T)]
    b = rows_c[np.lexsort(rows_c[:, :5].T)]
    np.testing.assert_array_equal(a[:, :4], b[:, :4])
    # sd is stored f32 on our side (x64 off) vs the oracle's double
    np.testing.assert_allclose(a[:, 4], b[:, 4], rtol=1e-6)
    np.testing.assert_allclose(a[:, 5:], b[:, 5:], atol=1e-3)
    print("bit-check: keypoint rows match the C reference",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
