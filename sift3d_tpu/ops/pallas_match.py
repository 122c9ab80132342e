"""Pallas streaming descriptor matcher.

The XLA matcher (features/match.py) materializes the (N1, N2) SSD matrix
in HBM before reducing it to top-2 candidates - fine for thousands of
descriptors, quadratic memory at scale. This kernel streams d2 through
VMEM in blocks: each grid step computes one (N1, B) distance block on the
MXU and folds it into a running top-2 (value, index) state held in VMEM
scratch across the sequential TPU grid, so HBM holds only the descriptors
and the O(N1 + N2) reduction outputs.

Backward-direction top-2 (for the forward-backward check) falls out per
block for free: each step owns its d2 rows and writes their (best, second,
argmin-over-d1) directly.

Tie semantics match the scan-order matcher: argmin prefers the lower
index within a block; across blocks, the merge prefers the earlier
(running) value on exact ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..features.match import _ratio_accept


def _top2_rows(d):
    """Per-row (best, second, argmin) of a 2D block, ties to lower col."""
    inf = jnp.float32(jnp.inf)
    b0 = jnp.min(d, axis=1, keepdims=True)                  # (n, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    is_min = d == b0
    i0 = jnp.min(jnp.where(is_min, cols, jnp.int32(2 ** 30)),
                 axis=1, keepdims=True)
    masked = jnp.where(cols == i0, inf, d)
    b1 = jnp.min(masked, axis=1, keepdims=True)
    return b0, b1, i0


def _merge(rb, rs, ri, b0, b1, i0):
    """Fold candidate top-2 (b0 <= b1, index i0) into running (rb, rs,
    ri); exact ties keep the running entry (the earlier scan index)."""
    take_new = b0 < rb
    best = jnp.where(take_new, b0, rb)
    idx = jnp.where(take_new, i0, ri)
    second = jnp.where(take_new, jnp.minimum(rb, b1), jnp.minimum(rs, b0))
    return best, second, idx


def _kernel(d1_ref, d2_ref, n1sq_ref, n2sq_ref,
            fbest_ref, fsecond_ref, fidx_ref,
            bbest_ref, bsecond_ref, bidx_ref,
            run_best, run_second, run_idx):
    # Grid (n1 blocks, n2 blocks), row-major: j cycles fastest.
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    b1blk = d1_ref.shape[0]
    b2blk = d2_ref.shape[0]

    @pl.when(j == 0)
    def _():
        run_best[:] = jnp.full_like(run_best, jnp.inf)
        run_second[:] = jnp.full_like(run_second, jnp.inf)
        run_idx[:] = jnp.zeros_like(run_idx)

    # (B1, B2) distance block on the MXU.
    g = jnp.dot(d1_ref[:], d2_ref[:].T, preferred_element_type=jnp.float32)
    d = n1sq_ref[:] + n2sq_ref[:].reshape(1, -1) - 2.0 * g
    d = jnp.maximum(d, 0.0)
    # Invalid rows/cols carry +inf norms; inf - inf would give NaN through
    # the matmul identity, so clean NaNs back to +inf.
    d = jnp.where(jnp.isnan(d), jnp.float32(jnp.inf), d)

    # Forward: block top-2 along B2, folded into the running state (which
    # persists across the inner j loop for this d1 block).
    b0, b1v, i0 = _top2_rows(d)
    nb, ns, ni = _merge(run_best[:], run_second[:], run_idx[:],
                        b0, b1v, i0 + j * b2blk)
    run_best[:] = nb
    run_second[:] = ns
    run_idx[:] = ni

    @pl.when(j == nj - 1)
    def _():
        fbest_ref[:] = run_best[:]
        fsecond_ref[:] = run_second[:]
        fidx_ref[:] = run_idx[:]

    # Backward: top-2 along B1 for this block's d2 rows, merged into the
    # output blocks (revisited once per outer i step; read-modify-write).
    c0, c1, k0 = _top2_rows(d.T)
    k0 = k0 + i * b1blk

    @pl.when(i == 0)
    def _():
        bbest_ref[:] = c0
        bsecond_ref[:] = c1
        bidx_ref[:] = k0

    @pl.when(i > 0)
    def _():
        mb, ms, mi = _merge(bbest_ref[:], bsecond_ref[:], bidx_ref[:],
                            c0, c1, k0)
        bbest_ref[:] = mb
        bsecond_ref[:] = ms
        bidx_ref[:] = mi


@functools.partial(jax.jit, static_argnames=("block1", "block2",
                                              "interpret"))
def _match_reduce(d1, d2, n1sq, n2sq, block1: int = 1024,
                  block2: int = 512, interpret: bool = False):
    n1, dim = d1.shape
    n2 = d2.shape[0]
    grid = (n1 // block1, n2 // block2)
    kw = dict(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block1, dim), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((block2, dim), lambda i, j: (j, 0), **kw),
            pl.BlockSpec((block1, 1), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((block2, 1), lambda i, j: (j, 0), **kw),
        ],
        out_specs=[
            pl.BlockSpec((block1, 1), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((block1, 1), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((block1, 1), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((block2, 1), lambda i, j: (j, 0), **kw),
            pl.BlockSpec((block2, 1), lambda i, j: (j, 0), **kw),
            pl.BlockSpec((block2, 1), lambda i, j: (j, 0), **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n2, 1), jnp.float32),
            jax.ShapeDtypeStruct((n2, 1), jnp.float32),
            jax.ShapeDtypeStruct((n2, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block1, 1), jnp.float32),
            pltpu.VMEM((block1, 1), jnp.float32),
            pltpu.VMEM((block1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(d1, d2, n1sq, n2sq)


def nn_match_streamed(d1: jax.Array, d2: jax.Array, nn_thresh: float,
                      valid1: jax.Array | None = None,
                      valid2: jax.Array | None = None,
                      block1: int = 1024, block2: int = 512,
                      interpret: bool = False) -> jax.Array:
    """Drop-in replacement for features.match.nn_match with O(N1 + N2)
    HBM footprint. N1/N2 must be divisible by block1/block2 (pad with
    invalid rows to round up); block sizes cap VMEM at
    ~(block1 + block2) * 3 KB."""
    n1, n2 = d1.shape[0], d2.shape[0]
    block1 = min(block1, n1)
    block2 = min(block2, n2)
    if n1 % block1 or n2 % block2:
        raise ValueError(f"N1 = {n1} / N2 = {n2} must be divisible by "
                         f"blocks {block1} / {block2}")
    d1 = d1.astype(jnp.float32)
    d2 = d2.astype(jnp.float32)
    inf = jnp.float32(jnp.inf)

    n1sq = jnp.sum(d1 * d1, axis=1, keepdims=True)
    n2sq = jnp.sum(d2 * d2, axis=1, keepdims=True)
    # Invalid rows: push their distances to +inf via the norm terms.
    if valid1 is not None:
        n1sq = jnp.where(valid1[:, None], n1sq, inf)
    if valid2 is not None:
        n2sq = jnp.where(valid2[:, None], n2sq, inf)

    fbest, fsecond, fidx, bbest, bsecond, bidx = (
        x[:, 0] for x in _match_reduce(d1, d2, n1sq, n2sq, block1=block1,
                                       block2=block2, interpret=interpret))

    fwd_ok = _ratio_accept(fbest, fsecond, nn_thresh)
    bwd_ok = _ratio_accept(bbest, bsecond, nn_thresh)
    consistent = (bidx[fidx] == jnp.arange(n1, dtype=jnp.int32)) & \
        bwd_ok[fidx]
    ok = fwd_ok & consistent & jnp.isfinite(fbest)
    if valid1 is not None:
        ok = ok & valid1
    return jnp.where(ok, fidx, -1).astype(jnp.int32)
