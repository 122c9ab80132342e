"""Per-stage tracing and structured pipeline logging.

The reference has no timers or structured logs (SURVEY §5.1, §5.5); its
debugging signals are implicit in its CSV outputs (keypoint / match /
inlier counts). This module makes them first-class:

- StageTimer: wall-clock stage timing with `jax.block_until_ready` around
  device work, plus optional jax.profiler trace capture;
- stage_report: one structured dict per pipeline run (keypoint counts per
  level, match count, inlier count, residuals) - the signals a production
  registration service monitors.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax
import numpy as np

_log_fn = None


def set_log_fn(fn) -> None:
    """Install a callable(dict) receiving every stage/report record.
    Defaults to silent; pass e.g. ``print`` or a JSON-lines writer."""
    global _log_fn
    _log_fn = fn


def _emit(record: dict) -> None:
    if _log_fn is not None:
        _log_fn(record)


class StageTimer:
    """Accumulates per-stage wall times; blocks on device results so the
    numbers are true execution times, not dispatch times."""

    def __init__(self, name: str = "pipeline"):
        self.name = name
        self.stages: dict[str, float] = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, stage_name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            for v in out.values():
                jax.block_until_ready(v)
            dt = time.perf_counter() - t0
            self.stages[stage_name] = self.stages.get(stage_name, 0.0) + dt
            _emit({"kind": "stage", "pipeline": self.name,
                   "stage": stage_name, "seconds": round(dt, 6)})

    def report(self) -> dict:
        total = time.perf_counter() - self._t0
        rec = {"kind": "timing", "pipeline": self.name,
               "total_seconds": round(total, 6),
               "stages": {k: round(v, 6) for k, v in self.stages.items()}}
        _emit(rec)
        return rec


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_report(kp=None, matches=None, registration=None,
                 extrema_counts: dict | None = None) -> dict:
    """Structured per-run signals: keypoint/match/inlier counts, residuals.

    Accepts any subset of: a Keypoints pytree, a matches index array, a
    RegistrationResult. Returns (and emits) one dict.
    """
    rec: dict = {"kind": "report"}
    if extrema_counts is not None:
        rec["extrema_per_level"] = {str(k): int(v)
                                    for k, v in extrema_counts.items()}
    if kp is not None:
        rec["num_keypoints"] = int(kp.count)
    if matches is not None:
        m = np.asarray(matches)
        rec["num_matches"] = int((m >= 0).sum())
    if registration is not None:
        rec["num_matches"] = int(registration.num_matches) \
            if hasattr(registration, "num_matches") else rec.get("num_matches")
        rec["num_inliers"] = int(registration.num_inliers)
        rec["registration_ok"] = bool(registration.ok)
        A = np.asarray(registration.A)
        rec["affine_linear_deviation"] = float(
            np.abs(A[:, :3] - np.eye(3)).max())
        rec["translation_norm"] = float(np.linalg.norm(A[:, 3]))
    _emit(rec)
    return rec


def jsonl_writer(path: str):
    """Log-record sink appending JSON lines to ``path``."""
    f = open(path, "a")

    def write(rec: dict):
        f.write(json.dumps(rec) + "\n")
        f.flush()
    return write
