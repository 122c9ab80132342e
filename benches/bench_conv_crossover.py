"""Measure the dense-matmul vs framed-banded crossover for conv_sep.

ops/conv.py routes each axis pass through the dense n x n matmul below
``BANDED_MIN_N`` and through the framed banded-tile formulation at or
above it. Round 3 chose 257 to protect the golden sizes, not from data
(VERDICT r3 weak #4). This bench times both formulations on the real
chip across axis lengths and prints the measured crossover, so the
threshold is set from hardware evidence.

Protocol: one separable 3-axis pass (conv_sep dimension order) on an
n^3 float32 volume with the pyramid's widest routine filter
(gauss_taps(1.6), 11 taps -> band half-width 5 at unit spacing), min of
5 steady-state runs each. Prints one JSON line per size on stderr and a
summary JSON line on stdout.

Usage: python benches/bench_conv_crossover.py [sizes...]
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SIZES = (96, 128, 192, 256, 384, 512)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import devices_or_die
    from sift3d_tpu.ops import conv
    from sift3d_tpu.ops.gauss import gauss_taps

    devices_or_die(jax)
    sizes = [int(a) for a in sys.argv[1:]] or list(SIZES)
    taps = gauss_taps(1.6)
    units = (1.0, 1.0, 1.0)

    def sep(vol, banded: bool):
        for axis in (2, 1, 0):
            if banded:
                vol = conv.conv_axis_banded(vol, taps, 1.0, 1.0, axis)
            else:
                n = vol.shape[axis]
                vol = conv.conv_axis(
                    vol, conv.conv_matrix(taps, 1.0, 1.0, n), axis)
        return vol

    fns = {b: jax.jit(lambda v, b=b: sep(v, b), static_argnums=())
           for b in (False, True)}

    def tmin(f, reps=5):
        """Steady-state min-of-reps; f must end with a small np.asarray
        fetch (block_until_ready once returned instantly on the
        experimental axon platform, see profile_config4.tmin)."""
        f()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        assert t > 1e-4, f"measured {t:.2e}s - sync is broken"
        return t

    rows = []
    for n in sizes:
        v = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((n, n, n)).astype(np.float32))
        t_mm = tmin(lambda: np.asarray(fns[False](v)[0, 0, :4]))
        t_bd = tmin(lambda: np.asarray(fns[True](v)[0, 0, :4]))
        rec = {"n": n, "matmul_s": round(t_mm, 5),
               "banded_s": round(t_bd, 5),
               "banded_speedup": round(t_mm / t_bd, 2)}
        rows.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)

    # Crossover = smallest size where banded wins and keeps winning.
    crossing = None
    for i, r in enumerate(rows):
        if all(q["banded_s"] < q["matmul_s"] for q in rows[i:]):
            crossing = r["n"]
            break
    result = {"metric": "banded_crossover_n", "value": crossing,
              "unit": "axis_len",
              "current_threshold": conv.BANDED_MIN_N}
    from benches.persist import record_last_good
    record_last_good(result, extra={"rows": rows,
                                    "taps": int(len(taps)),
                                    "sizes": sizes})
    result["rows"] = rows
    print(json.dumps(result))


if __name__ == "__main__":
    main()
