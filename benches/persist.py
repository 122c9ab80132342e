"""Last-good bench persistence (VERDICT r3 weak #3).

The driver runs ``bench.py`` exactly once at round end; a tunnel outage
at that moment erases the whole round's perf evidence (this happened in
round 3 - a multi-hour axon outage left ``BENCH_r03.json`` with rc=3).
To make evidence outage-proof, every successful bench run calls
:func:`record_last_good`, which atomically merges its result line (plus
roofline diagnostics, a timestamp, the git revision, and the backend it
ran on) into ``BENCH_LAST_GOOD.json`` at the repo root.  Benches run
early and often during a round and the file is committed, so an outage
at driver time degrades to "stale number" instead of "no number".

Protocol notes live in BASELINE.md ("Last-good bench protocol").
"""

import json
import os
import subprocess
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(_REPO, "BENCH_LAST_GOOD.json")


def _git_rev():
    try:
        return subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        return None


def record_last_good(result, roofline=None, extra=None):
    """Merge one successful bench ``result`` line into BENCH_LAST_GOOD.json.

    ``result`` is the same dict the bench prints on stdout (must carry a
    unique ``metric`` key - it is the merge key, so re-runs of the same
    bench overwrite their own slot and never clobber other benches').
    ``roofline`` is an optional list of roofline/diagnostic records;
    ``extra`` an optional dict of bench-specific context (sizes, gate
    pass rates, parity deltas).  The write is atomic (temp + rename) so
    a crash mid-write can't corrupt the committed last-good file.
    """
    try:
        import jax
        backend = jax.default_backend()
    except Exception:
        backend = None
    entry = dict(result)
    entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    entry["git"] = _git_rev()
    entry["backend"] = backend
    if roofline:
        entry["roofline"] = list(roofline)
    if extra:
        entry["extra"] = dict(extra)

    data = {"results": {}}
    try:
        with open(PATH) as f:
            data = json.load(f)
    except (OSError, ValueError):
        pass
    data.setdefault("results", {})[result["metric"]] = entry
    data["updated"] = entry["ts"]

    fd, tmp = tempfile.mkstemp(dir=_REPO, prefix=".benchlastgood.")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, PATH)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
