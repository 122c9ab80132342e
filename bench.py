"""Headline benchmark: batched pairwise registration throughput.

BASELINE.json config 4: register a batch of 64 synthetic volume pairs
(64^3 ellipsoidal-blob volumes, ref = src translated by 3 voxels along
x) end to end - pyramid -> extrema -> orientation -> Pallas descriptors
for both sides, MXU matching with forward-backward check, batched RANSAC
- as ONE jitted program, data-parallel over the available devices (one
chip here; the same program shards over a multi-chip mesh via
parallel.pipeline).

Metric: registered pairs/second, steady state, min of 5 timed batch runs
(the tunneled TPU adds run-to-run jitter).

Quality gate (re-calibrated round 4 over ALL 64 bench pairs via
benches/calibrate_bench_gate.py 64): pairs must satisfy the reference's
own accuracy contract - affine linear part within 5e-2 and translation
within 5 voxels elementwise (Sift3DTest.m:319-324) - at a rate no lower
than the reference's own demonstrated rate minus binomial noise. The C
reference passes 45/64 = 70.3% (sigma = sqrt(p(1-p)/64) = 5.7%); the
gate is 0.60 ~= p - 1.8*sigma. Round 3's 85% gate was set from the
first-16 sample (87.5%) and would have FAILED the reference itself over
the full set; round-2's 1-voxel gate was unpassable by either side.

Also asserts, compiled on the real chip: the Pallas descriptor window
kernel within 2e-3 of the XLA path (the golden contract, PARITY.md #21)
and the streamed matcher exact vs the dense matcher at multi-block
sizes - the hardware test leg for the interpret-mode-only Pallas tests.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
roofline/diagnostic lines go to stderr.

Baseline: the reference C implementation (bbrister/SIFT3D v1.4.6, -O3,
OpenMP, this host) on the first 16 of the SAME pairs via the test
oracle: 0.313 pairs/s, 87.5% gate pass (benches/calibrate_bench_gate.py,
2026-08-17; see BASELINE.md). The reference publishes no numbers of its
own. The per-volume keypoint pipeline benchmark (config 2) lives in
benches/bench_kp.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benches.data import SHIFT, make_pairs, pair_ok  # noqa: E402

BASELINE_PAIRS_PER_S = 0.313   # C reference, this host (BASELINE.md r3;
                               # confirmed at n=64: 0.3118, r4)
# Minimum fraction of pairs passing the reference's 5e-2/5-vox contract:
# the reference's own full-set rate (70.3%, n=64) minus ~1.8 binomial
# sigma, so one unlucky tail can't fail a healthy run (BASELINE.md r4).
GATE_PASS_RATE = 0.60

B = int(os.environ.get("SIFT3D_BENCH_B", "64"))   # override for smoke runs
SHAPE = (64, 64, 64)


def _err(*a):
    print(*a, file=sys.stderr, flush=True)


def tpu_parity_checks(src, jax, jnp):
    """Compiled-on-hardware parity: Pallas window kernel vs XLA path,
    streamed matcher vs dense matcher (VERDICT r2 weak #2/#3)."""
    from sift3d_tpu import api as api_mod
    from sift3d_tpu.api import Sift3D
    from sift3d_tpu.features.match import nn_match
    from sift3d_tpu.ops.pallas_match import nn_match_streamed

    s3d = Sift3D()
    kp = s3d.detect(np.asarray(src[0]))
    os.environ["SIFT3D_TPU_NO_PALLAS_WINDOW"] = "1"
    d_xla = s3d.extract()
    del os.environ["SIFT3D_TPU_NO_PALLAS_WINDOW"]
    api_mod._extract_fn.cache_clear()   # env var is read at trace time
    d_pal = s3d.extract()
    K = int(kp.count)
    dv = np.abs(np.asarray(d_xla.vec)[:K] - np.asarray(d_pal.vec)[:K])
    _err(f"parity: pallas-vs-xla max dev {dv.max():.2e} over {K} descs")
    assert dv.max() < 2e-3, \
        f"Pallas window kernel out of tolerance on hardware: {dv.max():.2e}"

    kp2 = s3d.detect(np.asarray(src[1]))
    d2 = s3d.extract(kp2)
    v1, v2 = d_pal.vec, d2.vec
    m_dense = np.asarray(nn_match(v1, v2, 0.8, d_pal.valid_mask(),
                                  d2.valid_mask()))
    # Small blocks force a multi-block grid (the stale-VMEM bug class of
    # ops/pallas_match.py:16-19 only shows up across block steps).
    m_stream = np.asarray(nn_match_streamed(v1, v2, 0.8, d_pal.valid_mask(),
                                            d2.valid_mask(),
                                            block1=64, block2=64))
    assert np.array_equal(m_dense, m_stream), \
        "streamed matcher disagrees with dense matcher on hardware"
    _err(f"parity: streamed matcher exact over {v1.shape[0]}x"
         f"{v2.shape[0]} descriptors")


def devices_or_die(jax, timeout_s: float = 300.0):
    """jax.devices() with a hard timeout: the axon tunnel can go down
    for hours (observed round 3), during which device enumeration blocks
    forever at 0%% CPU. Failing fast with a diagnostic beats hanging the
    driver."""
    import threading

    out = []

    def probe():
        try:
            out.append(("ok", jax.devices()))
        except Exception as e:       # surface init errors, not "timeout"
            out.append(("err", e))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    deadline = time.monotonic() + timeout_s
    while t.is_alive() and time.monotonic() < deadline:
        t.join(1.0)
        if out:
            break
    if not out:
        _err(f"FATAL: jax.devices() did not return within {timeout_s:.0f}s"
             " - the TPU tunnel is unreachable; aborting bench")
        os._exit(3)        # the hung thread would block a normal exit
    kind, val = out[0]
    if kind == "err":
        _err(f"FATAL: jax.devices() raised: {val!r}")
        os._exit(3)
    return val


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.pipeline import batch_register_pairs
    from sift3d_tpu.utils import roofline

    # Static per-level capacity: the batch path's one-program contract.
    # Per-octave caps sized from the measured per-level extrema profile
    # of these pairs (max 155 on octave 0, <=50 deeper; probe r5): a
    # flat 64 truncated 58/64 pairs (caught by the overflow assert
    # below), a flat 160+ would pad the deep octaves ~3x.
    params = SIFT3DParams(max_kp_per_level=192,
                          max_kp_per_octave=(192, 64, 64, 32))
    plan = pyr_mod.plan_pyramid(SHAPE, (1.0, 1.0, 1.0), params)
    devs = devices_or_die(jax)
    mesh = make_mesh(devs, data=len(devs), space=1)

    _err(f"generating {B} pairs of {SHAPE} volumes ...")
    src, ref = make_pairs(B, SHAPE)
    srcj, refj = jnp.asarray(src), jnp.asarray(ref)

    if jax.default_backend() not in ("cpu",):
        tpu_parity_checks(src, jax, jnp)

    fn = jax.jit(lambda s, r: batch_register_pairs(s, r, plan, params,
                                                   mesh))

    def run():
        res = fn(srcj, refj)
        return np.asarray(res.A), np.asarray(res.ok), \
            np.asarray(res.kp_overflow)

    A, ok, kp_ov = run()                # warm-up / compile
    # No silent keypoint loss: the per-level caps must hold every bench
    # volume's extrema (the reference's keypoint store is unbounded; a
    # capped run would not be comparable).
    assert not kp_ov.any(), \
        f"{int(kp_ov.sum())}/{B} pairs truncated keypoints at the " \
        "per-level cap; raise max_kp_per_level"
    good = ok & pair_ok(A)
    t_err = np.abs(A[:, :, 3] - np.array([-SHIFT, 0.0, 0.0])).max(1)
    _err(f"gate: {good.mean():.0%} pairs pass the reference contract "
         f"(median |t| err {np.median(t_err):.2f} vox; C reference "
         f"itself: 70.3% on these pairs)")
    assert good.mean() >= GATE_PASS_RATE, \
        f"quality gate: only {good.mean():.0%} pairs pass the " \
        f"reference's 5e-2/5-vox contract (gate {GATE_PASS_RATE:.0%})"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = min(times)   # min-of-5: the tunneled TPU adds run-to-run jitter
    pairs_per_s = B / t

    # Roofline: useful bytes/flops of the whole batched program vs chip
    # peaks (per-stage numbers live in benches/bench_kp.py).
    from sift3d_tpu.features.detect import kp_levels, level_cap
    kp_est = float(sum(level_cap(plan, o, params)
                       for o, _ in kp_levels(plan)))   # capacity bound
    cost = roofline.batch_register_cost(plan, kp_est, 17.0 ** 3, B)
    roof = list(roofline.roofline_report({"batch_register": t},
                                         {"batch_register": cost},
                                         n_chips=len(devs)))
    for rec in roof:
        _err(json.dumps(rec))

    result = {
        "metric": "registered_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pair/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 1),
    }
    from benches.persist import record_last_good
    record_last_good(result, roofline=roof, extra={
        "B": B, "shape": SHAPE, "gate_pass": round(float(good.mean()), 4),
        "median_t_err_vox": round(float(np.median(t_err)), 3),
        "times_s": [round(x, 4) for x in times],
    })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
