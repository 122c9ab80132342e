"""Split config-4's dominant "windows" stage into orientation vs
descriptors (follow-up to profile_config4.py, VERDICT r4 next #1).

profile_config4 showed windows (orient + descrip) at ~86% of the batch;
this script times the batched program cut after orientation, so

    t_orient = thru_orient - thru_extrema
    t_desc   = detect_describe - thru_orient

identifying which window family to attack next (orientation rides XLA
gathers + masked reductions; descriptors ride the Pallas window kernel,
ops/pallas_window.py).

Usage: python benches/profile_windows.py [B reps]
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
    from sift3d_tpu.config import SIFT3DParams
    from sift3d_tpu.features import detect as detect_mod
    from sift3d_tpu.features import extrema as extrema_mod
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel import pipeline as pl

    params = SIFT3DParams(max_kp_per_level=64)
    plan = pyr_mod.plan_pyramid(SHAPE, (1.0, 1.0, 1.0), params)
    mesh = make_mesh(jax.devices(), data=len(jax.devices()), space=1)
    src, _ = make_pairs(B, SHAPE)
    srcj = jnp.asarray(src)

    def err(*a):
        print(*a, file=sys.stderr, flush=True)

    def tmin(f, label=""):
        f()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        assert t > 1e-3, f"stage {label!r} measured {t:.2e}s"
        return t

    def upstream(s):
        scaled = jax.vmap(pyr_mod.im_scale)(s.astype(jnp.float32))
        g = pl.build_gpyr_batched(scaled, plan, mesh)
        d = pyr_mod.build_dog(g, plan)
        ext = {}
        for o, sl in detect_mod.kp_levels(plan):
            cap = detect_mod.level_cap(plan, o, params)
            ext[(o, sl)] = jax.vmap(
                lambda p, c, n, _cap=cap: extrema_mod.level_extrema(
                    p, c, n, params.peak_thresh, _cap))(
                d[(o, sl - 1)], d[(o, sl)], d[(o, sl + 1)])
        caps = {k: detect_mod.level_cap(plan, k[0], params) for k in ext}
        return g, ext, caps

    def thru_ext(s):
        _, ext, _ = upstream(s)
        return next(iter(ext.values()))[0]
    f_ext = jax.jit(thru_ext)
    t_ext = tmin(lambda: np.asarray(f_ext(srcj)[0, 0]), "extrema")
    err(f"thru extrema:       {t_ext:.3f}s")

    def thru_orient(s):
        g, ext, caps = upstream(s)
        kp = jax.vmap(lambda gp, ev: detect_mod.orient_levels(
            gp, ev, caps, plan, params))(g, ext)
        return kp.R
    f_ori = jax.jit(thru_orient)
    t_ori = tmin(lambda: np.asarray(f_ori(srcj)[0, 0]), "orient")
    err(f"thru orientation:   {t_ori:.3f}s  (orient = {t_ori - t_ext:.3f}s)")

    dd = jax.jit(lambda s: pl.batch_detect_describe(s, plan, params, mesh))
    t_dd = tmin(lambda: np.asarray(dd(srcj)[1].vec[0, 0, :4]), "dd")
    err(f"detect+describe:    {t_dd:.3f}s  (descrip = {t_dd - t_ori:.3f}s)")

    stages = {
        "B": B, "backend": jax.default_backend(),
        "thru_extrema_s": round(t_ext, 4),
        "thru_orient_s": round(t_ori, 4),
        "orient_s": round(t_ori - t_ext, 4),
        "descrip_s": round(t_dd - t_ori, 4),
        "detect_describe_s": round(t_dd, 4),
    }
    result = {"metric": "config4_window_split", "value": round(t_dd, 4),
              "unit": "s/side", "vs_baseline": None}
    from benches.persist import record_last_good
    record_last_good(result, extra=stages)
    print(json.dumps(stages))


if __name__ == "__main__":
    main()
