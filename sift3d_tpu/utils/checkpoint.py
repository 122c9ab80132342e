"""Checkpoint / resume for batch registration fleets.

The reference's nearest analog is artifact serialization (keypoint /
descriptor / transform CSV; SURVEY §5.4). This module makes resumability a
subsystem: descriptor sets and transforms persist per volume / per pair,
so a groupwise or batch registration job can be killed and re-launched
idempotently - the elasticity model for stateless registration work
(SURVEY §5.3: recovery = re-run the missing shard).
"""

from __future__ import annotations

import json
import os
import pathlib

import numpy as np

from ..features.descriptor import Descriptors
from ..features.keypoints import Keypoints


def save_descriptors(path: str, desc: Descriptors) -> None:
    """Persist a descriptor set (trimmed to count) as .npz."""
    n = int(desc.count)
    np.savez_compressed(path,
                        xyz=np.asarray(desc.xyz)[:n],
                        sd=np.asarray(desc.sd)[:n],
                        vec=np.asarray(desc.vec)[:n])


def load_descriptors(path: str, capacity: int | None = None) -> Descriptors:
    """Load a descriptor set, padding to ``capacity`` (default: count)."""
    import jax.numpy as jnp
    z = np.load(path)
    n = len(z["vec"])
    cap = capacity or max(n, 1)

    def pad(a):
        out = np.zeros((cap,) + a.shape[1:], a.dtype)
        out[:n] = a[:cap]
        return jnp.asarray(out)
    return Descriptors(xyz=pad(z["xyz"]), sd=pad(z["sd"]),
                       vec=pad(z["vec"]),
                       count=jnp.int32(min(n, cap)))


def save_keypoints(path: str, kp: Keypoints) -> None:
    np.savez_compressed(path, rows=kp.to_numpy(),
                        s=np.asarray(kp.s)[:int(kp.count)])


def load_keypoints(path: str, capacity: int | None = None) -> Keypoints:
    """Inverse of :func:`save_keypoints`, padding to ``capacity``."""
    import jax.numpy as jnp
    from ..dtypes import f64
    z = np.load(path)
    rows, s = z["rows"], z["s"]
    n = len(rows)
    cap = capacity or max(n, 1)

    def pad(a, dtype):
        out = np.zeros((cap,) + a.shape[1:], dtype)
        out[:n] = a[:cap]
        return jnp.asarray(out)
    return Keypoints(
        x=pad(rows[:, 0], f64()), y=pad(rows[:, 1], f64()),
        z=pad(rows[:, 2], f64()),
        o=pad(rows[:, 3].astype(np.int32), np.int32),
        s=pad(s.astype(np.int32), np.int32),
        sd=pad(rows[:, 4], f64()),
        R=pad(rows[:, 5:].reshape(n, 3, 3), np.float32),
        count=jnp.int32(min(n, cap)))


class GroupwiseCheckpoint:
    """Per-edge matched-correspondence store for resumable groupwise
    registration fleets.

    The matching phase (the expensive part: detect + extract + NN match
    per edge) checkpoints each edge's matched point pairs; a re-launched
    job skips finished edges (``has``) and the solve phase gathers every
    edge back into the padded arrays ``groupwise_solve[_sharded]``
    expects. Writes are atomic (tmp + rename), so a preemption mid-write
    never corrupts the store (SURVEY §5.3-5.4: recovery = re-run the
    missing shard).
    """

    def __init__(self, directory: str):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, i: int, j: int) -> pathlib.Path:
        return self.dir / f"edge_{int(i)}_{int(j)}.npz"

    def has(self, i: int, j: int) -> bool:
        return self._path(i, j).exists()

    def put(self, i: int, j: int, src_pts, ref_pts, count: int) -> None:
        n = int(count)
        p = self._path(i, j)
        # Temp name must NOT match the edge_*.npz glob, or a preemption
        # mid-write would crash (or corrupt) the resume scan below.
        tmp = self.dir / f".tmp_{p.name}"
        np.savez_compressed(tmp, src=np.asarray(src_pts)[:n],
                            ref=np.asarray(ref_pts)[:n])
        os.replace(tmp, p)

    def get(self, i: int, j: int):
        z = np.load(self._path(i, j))
        return z["src"], z["ref"]

    def edges(self) -> list[tuple[int, int]]:
        out = []
        for p in sorted(self.dir.glob("edge_*.npz")):
            parts = p.stem.split("_")
            if len(parts) != 3 or not (parts[1].isdigit() and
                                       parts[2].isdigit()):
                continue             # stray file, not an edge record
            out.append((int(parts[1]), int(parts[2])))
        return out

    def gather(self, edges_ij, capacity: int | None = None):
        """Load ``edges_ij`` into padded (E, M, 3) arrays + (E,) counts."""
        pts = [self.get(i, j) for i, j in edges_ij]
        cap = capacity or max((len(s) for s, _ in pts), default=1)
        E = len(pts)
        src = np.zeros((E, cap, 3))
        ref = np.zeros((E, cap, 3))
        cnt = np.zeros(E, np.int32)
        for e, (s, r) in enumerate(pts):
            n = min(len(s), cap)
            src[e, :n], ref[e, :n], cnt[e] = s[:n], r[:n], n
        return src, ref, cnt


class RegistrationCheckpoint:
    """Per-pair transform store with atomic JSON records.

    Usage:
        ckpt = RegistrationCheckpoint(dir)
        for pair in pairs:
            if ckpt.has(pair): continue       # resume: skip finished work
            ... register ...
            ckpt.put(pair, A, num_inliers)
    """

    def __init__(self, directory: str):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, key) -> pathlib.Path:
        name = "_".join(str(k) for k in key) if isinstance(key, (tuple, list)) \
            else str(key)
        return self.dir / f"pair_{name}.json"

    def has(self, key) -> bool:
        return self._path(key).exists()

    def put(self, key, A: np.ndarray, num_inliers: int = -1,
            ok: bool = True) -> None:
        rec = {"A": np.asarray(A, np.float64).tolist(),
               "num_inliers": int(num_inliers), "ok": bool(ok)}
        p = self._path(key)
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps(rec))
        os.replace(tmp, p)            # atomic: readers never see partials

    def get(self, key):
        rec = json.loads(self._path(key).read_text())
        return (np.asarray(rec["A"], np.float64), rec["num_inliers"],
                rec["ok"])

    def keys(self):
        for p in sorted(self.dir.glob("pair_*.json")):
            yield p.stem[len("pair_"):]
