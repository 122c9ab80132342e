"""Run the C reference (tests/oracle) on the EXACT bench pairs.

Calibrates bench.py's quality gate (VERDICT r2 weak #1: a gate the
reference itself cannot pass is miscalibrated): measures, on identical
data, the reference's pass rate under its own accuracy contract
(Sift3DTest.m:319-324) and its end-to-end seconds/pair - the
`vs_baseline` denominator for the headline registered-pairs/s metric.

Usage: python benches/calibrate_bench_gate.py [n_pairs]
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from benches.data import SHIFT, make_pairs, pair_ok  # noqa: E402
from oracle import get  # noqa: E402


def oracle_register(orc, src, ref):
    orc.detect(src)
    d1 = orc.extract()
    orc.detect(ref)
    d2 = orc.extract()
    m = orc.match(d1[:, 4:], d2[:, 4:])
    sel = m >= 0
    if sel.sum() < 4:
        return None, int(sel.sum())
    try:
        A = orc.ransac(d1[sel][:, :3], d2[m[sel]][:, :3])
    except RuntimeError:
        return None, int(sel.sum())
    return A, int(sel.sum())


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    orc = get()
    assert orc is not None, "oracle build failed"
    src, ref = make_pairs(n_pairs, (64, 64, 64))

    t0 = time.perf_counter()
    results = []
    for b in range(n_pairs):
        A, nm = oracle_register(orc, src[b], ref[b])
        ok = bool(pair_ok(A)) if A is not None else False
        t_err = float(np.abs(A[:, 3] - [-SHIFT, 0, 0]).max()) \
            if A is not None else float("inf")
        results.append({"pair": b, "ok": ok, "matches": nm,
                        "t_err_vox": round(t_err, 2)})
        print(results[-1], flush=True)
    elapsed = time.perf_counter() - t0

    summary = {
        "n_pairs": n_pairs,
        "oracle_pass_rate": sum(r["ok"] for r in results) / n_pairs,
        "oracle_s_per_pair": round(elapsed / n_pairs, 2),
        "oracle_pairs_per_s": round(n_pairs / elapsed, 4),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
