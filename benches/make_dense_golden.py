"""One-time C-oracle golden for config 3 at its headline size (VERDICT r4 #7).

Runs the reference C dense-descriptor path (sift3d/sift.c:2354-2496 via
tests/oracle) ONCE on the exact bench volume (seed 7, nblob = max(60, n/2),
same as benches/bench_dense.py) and caches a golden artifact so that
``bench_dense.py --check`` can record ``checked_vs_oracle: true`` at 512^3
without paying the ~52-minute C run every time.

The full 512^3 output is 12 x 512^3 floats = 6.4 GB - too large to commit.
The artifact stores instead:
  - ``sub``: the stride-8 subsample ``ref[:, ::8, ::8, ::8]`` (12 x 64^3,
    ~12.6 MB raw), a dense pointwise probe across the whole field;
  - ``ch_mean`` / ``ch_absmax``: per-channel full-volume statistics, an
    integral check over every voxel the subsample misses;
  - provenance: n, seed, nblob, stride, the C wall time, and the SHA256 of
    the full reference output bytes.

Usage: python benches/make_dense_golden.py [n]   (default 512)
Writes benches/golden/dense_{n}_seed7.npz.
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

STRIDE = 8


def golden_path(n):
    return os.path.join(_REPO, "benches", "golden", f"dense_{n}_seed7.npz")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from benches.data import make_volume
    from oracle import get

    orc = get()
    if orc is None:
        print("oracle unavailable", file=sys.stderr)
        sys.exit(1)

    nblob = max(60, n // 2)
    print(f"generating ({n},{n},{n}) volume (seed 7, {nblob} blobs)...",
          file=sys.stderr, flush=True)
    vol = make_volume((n, n, n), nblob=nblob, seed=7)

    print("running C reference dense path (slow at 512^3: ~52 min)...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    ref = orc.dense(vol)
    tc = time.perf_counter() - t0
    print(f"C reference dense: {tc:.1f} s = {n ** 3 / tc:.3e} vox/s",
          file=sys.stderr, flush=True)

    sha = hashlib.sha256(np.ascontiguousarray(ref).tobytes()).hexdigest()
    sub = ref[:, ::STRIDE, ::STRIDE, ::STRIDE].copy()
    ch_mean = ref.reshape(12, -1).mean(axis=1, dtype=np.float64)
    ch_absmax = np.abs(ref).reshape(12, -1).max(axis=1)

    out = golden_path(n)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, sub=sub, ch_mean=ch_mean, ch_absmax=ch_absmax,
        meta=np.array([json.dumps({
            "n": n, "seed": 7, "nblob": nblob, "stride": STRIDE,
            "c_seconds": round(tc, 2), "sha256_full": sha,
            "ref": "sift3d/sift.c:2354-2496 via tests/oracle orc_dense",
        })]))
    print(json.dumps({"golden": out, "c_seconds": round(tc, 2),
                      "sha256_full": sha}))


if __name__ == "__main__":
    main()
