"""Per-stage wall-clock profile of the config-4 batched registration.

Times each stage of bench.py's batched program separately on the live
backend (detect+describe split into pyramid / extrema / windows, then
match+RANSAC), steady-state min-of-N, so optimization work targets the
measured dominant stage instead of the roofline's useful-work estimate.

Usage: python benches/profile_config4.py [B] [reps]
Diagnostics to stderr, one JSON summary line to stdout.
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    SHAPE = (64, 64, 64)

    from benches.data import make_pairs
    from sift3d_tpu import pyramid as pyr_mod
    from sift3d_tpu.config import MatchParams, RansacParams, SIFT3DParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel import pipeline as pl
    from sift3d_tpu.register.pipeline import register_pair

    params = SIFT3DParams(max_kp_per_level=64)
    plan = pyr_mod.plan_pyramid(SHAPE, (1.0, 1.0, 1.0), params)
    devs = jax.devices()
    mesh = make_mesh(devs, data=len(devs), space=1)
    src, ref = make_pairs(B, SHAPE)
    srcj, refj = jnp.asarray(src), jnp.asarray(ref)

    def err(*a):
        print(*a, file=sys.stderr, flush=True)

    def tmin(f, label=""):
        """Steady-state min-of-reps. ``f`` must END with a small
        np.asarray fetch - the completion-wait methodology bench.py's
        headline number uses (a tiny D2H costs one ~26 ms tunnel round
        trip, negligible vs multi-second stages, and is robust where
        block_until_ready once returned instantly on this experimental
        axon platform - observed r5, all-zero profile)."""
        f()   # warm-up (compile)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        assert t > 1e-3, \
            f"stage {label!r} measured {t:.2e}s - sync is broken"
        return t

    # Full program (the bench.py metric).
    full = jax.jit(lambda s, r: pl.batch_register_pairs(
        s, r, plan, params, mesh))
    t_full = tmin(lambda: np.asarray(full(srcj, refj).A), "full")
    err(f"full batch_register_pairs:      {t_full:.3f}s")

    # One side detect+describe.
    dd = jax.jit(lambda s: pl.batch_detect_describe(s, plan, params, mesh))
    t_dd = tmin(lambda: np.asarray(dd(srcj)[1].vec[0, 0, :4]), "dd")
    err(f"detect+describe one side:       {t_dd:.3f}s")

    # Pyramid (+DoG) only.
    def pyr_only(s):
        scaled = jax.vmap(pyr_mod.im_scale)(s.astype(jnp.float32))
        g = pl.build_gpyr_batched(scaled, plan, mesh)
        d = pyr_mod.build_dog(g, plan)
        return d[max(d)]
    pyr_fn = jax.jit(pyr_only)
    t_pyr = tmin(lambda: np.asarray(pyr_fn(srcj)[0, 0, 0, :4]), "pyr")
    err(f"  pyramid+DoG:                  {t_pyr:.3f}s")

    # Pyramid + extrema (no windows).
    from sift3d_tpu.features import detect as detect_mod
    from sift3d_tpu.features import extrema as extrema_mod

    def thru_extrema(s):
        scaled = jax.vmap(pyr_mod.im_scale)(s.astype(jnp.float32))
        g = pl.build_gpyr_batched(scaled, plan, mesh)
        d = pyr_mod.build_dog(g, plan)
        outs = []
        for o, sl in detect_mod.kp_levels(plan):
            cap = detect_mod.level_cap(plan, o, params)
            outs.append(jax.vmap(
                lambda p, c, n, _cap=cap: extrema_mod.level_extrema(
                    p, c, n, params.peak_thresh, _cap))(
                d[(o, sl - 1)], d[(o, sl)], d[(o, sl + 1)])[0])
        return outs[0]
    ext_fn = jax.jit(thru_extrema)
    t_ext = tmin(lambda: np.asarray(ext_fn(srcj)[0, :2]), "extrema")
    err(f"  pyramid+DoG+extrema:          {t_ext:.3f}s")
    err(f"  => windows (orient+descrip):  {t_dd - t_ext:.3f}s")

    # Match + RANSAC from precomputed descriptors.
    ds = dd(srcj)[1]
    dr = dd(refj)[1]
    jax.block_until_ready(ds.vec)
    jax.block_until_ready(dr.vec)
    reg = jax.jit(lambda a, b: jax.vmap(
        lambda x, y: register_pair(x, y, (1.0, 1.0, 1.0), (1.0, 1.0, 1.0),
                                   MatchParams(), RansacParams()))(a, b))
    t_reg = tmin(lambda: np.asarray(reg(ds, dr).A), "match+ransac")
    err(f"match+RANSAC {B} pairs:           {t_reg:.3f}s")
    err(f"sum 2*dd + reg = {2 * t_dd + t_reg:.3f}s vs full {t_full:.3f}s "
        "(gap = fusion across sides)")

    result = {
        "metric": "config4_stage_profile",
        "value": round(t_full, 4), "unit": "s/batch",
        "vs_baseline": None,
    }
    stages = {
        "B": B, "backend": jax.default_backend(),
        "full_s": round(t_full, 4), "detect_describe_one_side_s":
        round(t_dd, 4), "pyramid_dog_s": round(t_pyr, 4),
        "thru_extrema_s": round(t_ext, 4),
        "windows_s": round(t_dd - t_ext, 4),
        "match_ransac_s": round(t_reg, 4),
    }
    from benches.persist import record_last_good
    record_last_good(result, extra=stages)
    print(json.dumps(stages))


if __name__ == "__main__":
    main()
