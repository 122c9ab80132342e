"""Keypoint containers: fixed-capacity struct-of-arrays pytrees.

The reference grows Keypoint slabs dynamically (imtypes.h:264-270,
immacros.h:199-222). On TPU we use static-capacity padded arrays with a
validity count, which keeps every downstream op statically shaped.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import f64


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Keypoints:
    """Padded keypoint set.

    Fields mirror the reference Keypoint (imtypes.h:253-261): coordinates are
    in *octave* space; ``sd`` is the absolute scale; ``R`` the 3x3 rotation.
    Rows >= count are padding.
    """
    x: jax.Array       # (K,) f64 octave-space coords
    y: jax.Array
    z: jax.Array
    o: jax.Array       # (K,) i32 octave index
    s: jax.Array       # (K,) i32 level index
    sd: jax.Array      # (K,) f64 absolute scale
    R: jax.Array       # (K, 3, 3) f32 rotation (rows x cols as reference)
    count: jax.Array   # () i32 number of valid rows

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.count

    def to_numpy(self) -> np.ndarray:
        """Rows [x y z o sd R00..R22] (14 cols), trimmed to count."""
        n = int(self.count)
        out = np.zeros((n, 14), np.float64)
        out[:, 0] = np.asarray(self.x)[:n]
        out[:, 1] = np.asarray(self.y)[:n]
        out[:, 2] = np.asarray(self.z)[:n]
        out[:, 3] = np.asarray(self.o)[:n]
        out[:, 4] = np.asarray(self.sd)[:n]
        out[:, 5:] = np.asarray(self.R)[:n].reshape(n, 9)
        return out


def head(kp: Keypoints, n: int) -> Keypoints:
    """First ``n`` rows of a compacted keypoint set (static slice)."""
    return Keypoints(
        x=kp.x[:n], y=kp.y[:n], z=kp.z[:n], o=kp.o[:n], s=kp.s[:n],
        sd=kp.sd[:n], R=kp.R[:n],
        count=jnp.minimum(kp.count, jnp.int32(n)))


def concatenate(parts: list[Keypoints]) -> Keypoints:
    """Concatenate padded keypoint sets, compacting valid rows in order."""
    caps = sum(p.capacity for p in parts)
    xs, ys, zs, os_, ss, sds, Rs, counts = [], [], [], [], [], [], [], []
    offset = jnp.zeros((), jnp.int32)
    # Build global destination positions: valid rows of part i go after all
    # valid rows of parts < i.
    dest_list = []
    for p in parts:
        idx = jnp.arange(p.capacity, dtype=jnp.int32)
        valid = idx < p.count
        dest = jnp.where(valid, idx + offset, caps)  # caps = drop slot
        dest_list.append(dest)
        offset = offset + p.count.astype(jnp.int32)
        xs.append(p.x); ys.append(p.y); zs.append(p.z)
        os_.append(p.o); ss.append(p.s); sds.append(p.sd); Rs.append(p.R)
    dest = jnp.concatenate(dest_list)

    def scatter(vals, fill_shape, dtype):
        buf = jnp.zeros((caps + 1,) + fill_shape, dtype)
        buf = buf.at[dest].set(jnp.concatenate(vals).astype(dtype))
        return buf[:caps]

    return Keypoints(
        x=scatter(xs, (), f64()),
        y=scatter(ys, (), f64()),
        z=scatter(zs, (), f64()),
        o=scatter(os_, (), jnp.int32),
        s=scatter(ss, (), jnp.int32),
        sd=scatter(sds, (), f64()),
        R=scatter(Rs, (3, 3), jnp.float32),
        count=offset)
