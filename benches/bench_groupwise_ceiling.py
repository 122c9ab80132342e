"""Groupwise scale ceiling: 256 -> 512 -> 1024 volumes (VERDICT r4 #8).

The distributed groupwise solve (register/groupwise.py, SURVEY §5.8)
psum-reduces per-shard Gram blocks into a reduced normal-equation system
of size (4(n-1))^2 f64 that is then solved REPLICATED on every device.
Per-edge RANSAC/Gram work stays constant as the fleet grows, so the two
quadratic terms - the psum payload and the replicated dense solve - are
the scale cliff. This bench measures both against fleet size on the
8-device virtual mesh and records the supported-ceiling curve.

Payload model (f64): H4 (n-1, n-1, 4, 4) + rhs (n-1, 4, 3)
  n=256:   8.4 MB    n=512:  33.5 MB    n=1024: 134.1 MB
On real v5e ICI (~100 GB/s/link) even 134 MB psums in ~ms; the
replicated (4(n-1))^2 solve (4092^2 at n=1024) is O(n^3) flops but only
~0.5 s on one chip - the practical ceiling is HBM for the H4 buffer
(134 MB x #devices resident during reduction), comfortably >= 1024
volumes per 16 GB chip.

Prints ONE JSON line; persists via record_last_good. CPU-only (safe
during TPU tunnel outages).

Usage: python benches/bench_groupwise_ceiling.py [n_vol...]
"""

import json
import os
import resource
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def _err(*a):
    print(*a, file=sys.stderr, flush=True)


def _peak_rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 8:
        _err("FATAL: need 8 virtual devices")
        return 2

    from benches.data import make_fleet
    from sift3d_tpu.config import RansacParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.register.groupwise import groupwise_solve_sharded

    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    params = RansacParams(num_iter=60)
    mesh = make_mesh(jax.devices()[:8], data=8, space=1)

    rows = []
    for nv in sizes:
        edges, src, ref, counts, want = make_fleet(n_vol=nv, seed=6)
        fn = jax.jit(lambda s, r, c, _e=edges, _nv=nv:
                     groupwise_solve_sharded(
                         _e, s, r, c, num_volumes=_nv, mesh=mesh,
                         ransac_params=params))
        args = (jnp.asarray(src), jnp.asarray(ref), jnp.asarray(counts))
        t0 = time.perf_counter()
        res = jax.block_until_ready(fn(*args))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = jax.block_until_ready(fn(*args))
        t_run = time.perf_counter() - t0
        assert bool(res.ok), f"n_vol={nv}: system not solvable"
        A = np.asarray(res.A)
        max_lin = max(np.abs(A[i][:, :3] - want[i][:, :3]).max()
                      for i in range(nv))
        max_t = max(np.abs(A[i][:, 3] - want[i][:, 3]).max()
                    for i in range(nv))
        assert max_lin < 5e-2 and max_t < 5.0, \
            f"n_vol={nv}: accuracy contract violated " \
            f"({max_lin:.3f}/{max_t:.3f})"
        psum_mb = ((nv - 1) ** 2 * 16 + (nv - 1) * 12) * 8 / 1e6
        rows.append({
            "n_vol": nv, "edges": len(edges),
            "reduced_system": 4 * (nv - 1),
            "psum_payload_mb": round(psum_mb, 1),
            "steady_s": round(t_run, 3),
            "first_incl_compile_s": round(t_first, 2),
            "peak_rss_mb_cum": round(_peak_rss_mb(), 0),
            "max_lin_err": round(float(max_lin), 4),
            "max_t_err": round(float(max_t), 4),
        })
        _err(json.dumps(rows[-1]))

    result = {"metric": "groupwise_ceiling_max_volumes",
              "value": sizes[-1], "unit": "volumes",
              "vs_baseline": None}
    from benches.persist import record_last_good
    record_last_good(result, extra={"rows": rows})
    result["rows"] = rows
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
