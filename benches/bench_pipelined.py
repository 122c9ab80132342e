"""Pipelined vs sequential GSS pyramid builder (VERDICT r4 weak #5).

The composed-operator builder (pyramid.build_gpyr_pipelined, wired into
parallel.pipeline.build_gpyr_batched via ``pipelined=True``) breaks the
sequential octave/level dependency (reference build_gpyr,
sift.c:989-1050): dependency depth drops from 1 + num_octaves *
(num_gpyr_levels - 2) convolutions to 3. Exactness (2e-6) is already
tested (tests/test_pyramid_pipelined.py); this bench supplies the
missing PERFORMANCE evidence on the live backend so the default can be
chosen from data.

Protocol: min-of-N steady state of the full batched pyramid (all
levels), synced by a tiny D2H fetch of the deepest level (bench.py
methodology). Prints one JSON line; persists via record_last_good.

Usage: python benches/bench_pipelined.py [B n reps]...
       (triples; default "8 64 5" and "1 256 3")
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import devices_or_die
    from benches.data import make_volume
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel import pipeline as pl

    devices_or_die(jax)
    args = [int(a) for a in sys.argv[1:]]
    cases = [tuple(args[i:i + 3]) for i in range(0, len(args), 3)] or \
        [(8, 64, 5), (1, 256, 3)]

    params = SIFT3DParams()
    mesh = make_mesh(jax.devices(), data=1, space=1)

    def tmin(f, reps):
        f()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        assert t > 1e-3, f"measured {t:.2e}s - sync is broken"
        return t

    rows = []
    for B, n, reps in cases:
        plan = pyr_mod.plan_pyramid((n, n, n), (1.0, 1.0, 1.0), params)
        deep = (plan.num_octaves - 1, plan.last_gpyr_level)
        vols = jnp.asarray(np.stack(
            [make_volume((n, n, n), nblob=max(30, n // 2), seed=7 + b)
             for b in range(B)]))

        fns = {}
        for pipe in (False, True):
            fns[pipe] = jax.jit(lambda v, p=pipe: pl.build_gpyr_batched(
                jax.vmap(pyr_mod.im_scale)(v.astype(jnp.float32)),
                plan, mesh, pipelined=p)[deep])
        t_seq = tmin(lambda: np.asarray(fns[False](vols)[0, 0, 0, :2]),
                     reps)
        t_pipe = tmin(lambda: np.asarray(fns[True](vols)[0, 0, 0, :2]),
                      reps)
        rec = {"B": B, "n": n, "sequential_s": round(t_seq, 5),
               "pipelined_s": round(t_pipe, 5),
               "pipelined_speedup": round(t_seq / t_pipe, 3)}
        rows.append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)

    result = {"metric": "pipelined_pyramid_speedup",
              "value": rows[0]["pipelined_speedup"], "unit": "x",
              "vs_baseline": None}
    from benches.persist import record_last_good
    record_last_good(result, extra={"rows": rows,
                                    "backend": jax.default_backend()})
    result["rows"] = rows
    print(json.dumps(result))


if __name__ == "__main__":
    main()
