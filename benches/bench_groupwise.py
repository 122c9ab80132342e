"""Config-5 scale evidence: groupwise registration at 256 volumes.

BASELINE.json config 5 stipulates groupwise registration of 256 volumes
across hosts. Real multi-chip hardware is not available in this
environment, so this bench produces the stand-in evidence VERDICT r3 #7
asks for, on the virtual CPU mesh (xla_force_host_platform_device_count):

1. The full 256-volume system at its stated size - 510 star+loop edges
   RANSAC-filtered and Gram-assembled shard-wise, psum-reduced into the
   (1020, 1020) reduced normal-equation system (per-row 255x255 blocks of
   4x4), solved replicated - with the matching phase checkpointed through
   a simulated preemption and resumed (utils/checkpoint.py), and the
   recovered affines checked against the fleet's ground truth.
2. A weak-scaling table: n_vol = 32 * N over N = 1, 2, 4, 8 devices
   (per-device edge count constant at ~62). NOTE the honest caveat: the
   virtual devices share ONE physical core, so wall-clock cannot show
   parallel speedup here; the table records per-device work, the psum
   payload each step moves (the quantity that must stay flat for >80%
   scaling on real ICI), and wall-clock for completeness.

Prints ONE JSON line on stdout; diagnostics on stderr. Results persist
to BENCH_LAST_GOOD.json (benches/persist.py).

Usage: python benches/bench_groupwise.py  (forces the CPU backend; safe
to run during TPU tunnel outages)
"""

import json
import os
import resource
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Must precede the first jax use on a fresh interpreter; with the axon
# .pth preimport the config.update below is what actually takes effect.
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
        _err("FATAL: need 8 virtual devices; set XLA_FLAGS="
             "--xla_force_host_platform_device_count=8 before jax import")
        return 2

    from benches.data import make_fleet
    from sift3d_tpu.config import RansacParams
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.register.groupwise import groupwise_solve_sharded
    from sift3d_tpu.utils.checkpoint import GroupwiseCheckpoint

    params = RansacParams(num_iter=60)

    # --- 1. full config-5 size: 256 volumes, checkpoint + resume -------
    n_vol = 256
    edges, src, ref, counts, want = make_fleet(n_vol=n_vol)
    _err(f"fleet: {n_vol} volumes, {len(edges)} edges, reduced system "
         f"{4 * (n_vol - 1)}x{4 * (n_vol - 1)}")

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        ckpt = GroupwiseCheckpoint(os.path.join(td, "gw"))

        def run_matching(kill_after=None):
            done = 0
            for e, (i, j) in enumerate(edges):
                if ckpt.has(i, j):
                    continue
                ckpt.put(i, j, src[e], ref[e], counts[e])
                done += 1
                if kill_after is not None and done >= kill_after:
                    return False
            return True

        assert not run_matching(kill_after=200)     # simulated preemption
        assert len(ckpt.edges()) == 200
        assert run_matching()                       # resume completes
        src_c, ref_c, cnt_c = ckpt.gather([tuple(e) for e in edges])

    mesh = make_mesh(jax.devices()[:8], data=8, space=1)
    fn = jax.jit(lambda s, r, c: groupwise_solve_sharded(
        edges, s, r, c, num_volumes=n_vol, mesh=mesh,
        ransac_params=params))
    t0 = time.perf_counter()
    res = jax.block_until_ready(fn(jnp.asarray(src_c), jnp.asarray(ref_c),
                                   jnp.asarray(cnt_c)))
    t_compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = jax.block_until_ready(fn(jnp.asarray(src_c), jnp.asarray(ref_c),
                                   jnp.asarray(cnt_c)))
    t_run = time.perf_counter() - t0

    assert bool(res.ok), "groupwise system not solvable"
    A = np.asarray(res.A)
    max_lin = max(np.abs(A[i][:, :3] - want[i][:, :3]).max()
                  for i in range(n_vol))
    max_t = max(np.abs(A[i][:, 3] - want[i][:, 3]).max()
                for i in range(n_vol))
    _err(f"256-volume solve: {t_run:.2f} s steady (first run incl. "
         f"compile {t_compile_and_run:.2f} s), peak RSS "
         f"{_peak_rss_mb():.0f} MB")
    _err(f"accuracy vs fleet ground truth: max |dLin| {max_lin:.3f}, "
         f"max |dt| {max_t:.3f} (contract: 5e-2 / 5 vox)")
    assert max_lin < 5e-2 and max_t < 5.0, "accuracy contract violated"

    # --- 2. weak scaling: n_vol = 32 * N over N devices ----------------
    table = []
    for N in (1, 2, 4, 8):
        nv = 32 * N
        e_n, s_n, r_n, c_n, _ = make_fleet(n_vol=nv, seed=6)
        mesh_n = make_mesh(jax.devices()[:N], data=N, space=1)
        fn_n = jax.jit(lambda s, r, c, _e=e_n, _nv=nv, _m=mesh_n:
                       groupwise_solve_sharded(
                           _e, s, r, c, num_volumes=_nv, mesh=_m,
                           ransac_params=params))
        args = (jnp.asarray(s_n), jnp.asarray(r_n), jnp.asarray(c_n))
        jax.block_until_ready(fn_n(*args))          # compile
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn_n(*args))
        dt = time.perf_counter() - t0
        assert bool(out.ok)
        # The psum payload per reduction step: the partial reduced system
        # H4 (nv-1, nv-1, 4, 4) + rhs, in f64. On real ICI this is what
        # each chip moves; per-device RANSAC/Gram work is constant here.
        psum_mb = ((nv - 1) ** 2 * 16 + (nv - 1) * 12) * 8 / 1e6
        table.append({"devices": N, "n_vol": nv, "edges": len(e_n),
                      "edges_per_dev": len(e_n) // N,
                      "wall_s": round(dt, 3),
                      "psum_payload_mb": round(psum_mb, 2)})
        _err(json.dumps(table[-1]))
    _err("NOTE: virtual devices share one physical core; wall_s cannot "
         "show parallel speedup here. Constant edges_per_dev with the "
         "psum payload growing only with the solved system (not with "
         "per-device work) is the scaling-relevant evidence.")

    result = {
        "metric": "groupwise_256vol_solve_s",
        "value": round(t_run, 3),
        "unit": "s",
        "vs_baseline": None,   # no reference analog (SURVEY §5.8)
    }
    from benches.persist import record_last_good
    record_last_good(result, extra={
        "n_vol": n_vol, "edges": len(edges),
        "reduced_system": 4 * (n_vol - 1),
        "peak_rss_mb": round(_peak_rss_mb(), 1),
        "max_lin_err": round(float(max_lin), 4),
        "max_t_err": round(float(max_t), 4),
        "resume_checkpointed_edges": 200,
        "weak_scaling": table,
    })
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
