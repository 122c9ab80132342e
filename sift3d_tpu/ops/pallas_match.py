"""Pallas streaming descriptor matcher.

The XLA matcher (features/match.py) materializes the (N1, N2) SSD matrix
in HBM before reducing it to top-2 candidates - fine for thousands of
descriptors, quadratic memory at scale. This kernel streams the target
set through VMEM in blocks: each grid step computes one (Bq, Bt) distance
block on the MXU and folds it into a running top-2 (value, index) state
held in VMEM scratch across the sequential TPU grid, so HBM holds only
the descriptors and the O(N) reduction outputs.

The reduction runs one *direction* per pallas_call: the running state is
revisited only along the innermost grid dimension (consecutive grid
steps), which is the only revisiting pattern the TPU pipelining model
preserves. The forward-backward consistency check therefore issues two
calls with the roles of d1/d2 swapped - 2x the MXU work of a fused
kernel, but correct at any grid size. (A previous fused version merged
the backward top-2 into output blocks revisited across the *outer* grid
dim; TPU double-buffering made those merges read stale data whenever
both grid dims exceeded 1.)

Tie semantics match the scan-order matcher: argmin prefers the lower
index within a block; across blocks, the merge prefers the earlier
(running) value on exact ties.

Reference semantics: SIFT3D_nn_match / match_desc, sift3d/sift.c:2840-2969.
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


def _kernel(q_ref, t_ref, qsq_ref, tsq_ref,
            best_ref, second_ref, idx_ref,
            run_best, run_second, run_idx):
    # Grid (query blocks, target blocks), row-major: j cycles fastest, so
    # the running state and the output block for query block i live across
    # exactly the consecutive steps (i, 0) .. (i, nj-1).
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    btblk = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        run_best[:] = jnp.full_like(run_best, jnp.inf)
        run_second[:] = jnp.full_like(run_second, jnp.inf)
        run_idx[:] = jnp.zeros_like(run_idx)

    # (Bq, Bt) distance block on the MXU.
    g = jnp.dot(q_ref[:], t_ref[:].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    d = qsq_ref[:] + tsq_ref[:].reshape(1, -1) - 2.0 * g
    d = jnp.maximum(d, 0.0)
    # Invalid rows/cols carry +inf norms; inf - inf would give NaN through
    # the matmul identity, so clean NaNs back to +inf.
    d = jnp.where(jnp.isnan(d), jnp.float32(jnp.inf), d)

    b0, b1v, i0 = _top2_rows(d)
    nb, ns, ni = _merge(run_best[:], run_second[:], run_idx[:],
                        b0, b1v, i0 + j * btblk)
    run_best[:] = nb
    run_second[:] = ns
    run_idx[:] = ni

    @pl.when(j == nj - 1)
    def _():
        best_ref[:] = run_best[:]
        second_ref[:] = run_second[:]
        idx_ref[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("blockq", "blockt",
                                             "interpret"))
def _reduce_one_way(q, t, qsq, tsq, blockq: int, blockt: int,
                    interpret=False):
    """Per-query (best, second, argmin) over all targets; shapes (Nq, 1)."""
    nq, dim = q.shape
    nt = t.shape[0]
    grid = (nq // blockq, nt // blockt)
    kw = dict(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blockq, dim), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((blockt, dim), lambda i, j: (j, 0), **kw),
            pl.BlockSpec((blockq, 1), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((blockt, 1), lambda i, j: (j, 0), **kw),
        ],
        out_specs=[
            pl.BlockSpec((blockq, 1), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((blockq, 1), lambda i, j: (i, 0), **kw),
            pl.BlockSpec((blockq, 1), lambda i, j: (i, 0), **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blockq, 1), jnp.float32),
            pltpu.VMEM((blockq, 1), jnp.float32),
            pltpu.VMEM((blockq, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q, t, qsq, tsq)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_rows(a: jax.Array, n_to: int) -> jax.Array:
    n = a.shape[0]
    if n == n_to:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((n_to - n,) + a.shape[1:], a.dtype)], axis=0)


def match_reduce_streamed(d1: jax.Array, d2: jax.Array,
                          valid1: jax.Array | None = None,
                          valid2: jax.Array | None = None,
                          block1: int = 512, block2: int = 512,
                          interpret=False):
    """Both directions' top-2 reductions via the streaming kernel.

    Pads N1/N2 up to block multiples internally (padding rows carry +inf
    norms and are never selected). Returns
    ``(fbest, fsecond, fidx, bbest, bsecond, bidx)`` with shapes
    (N1,), (N1,), (N1,), (N2,), (N2,), (N2,); indices are into the
    *unpadded* opposite set except for all-invalid rows, whose best
    stays +inf (callers must gate on finiteness).
    """
    n1, n2 = d1.shape[0], d2.shape[0]
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

    block1 = min(block1, _round_up(n1, 8))
    block2 = min(block2, _round_up(n2, 8))
    n1p = _round_up(n1, block1)
    n2p = _round_up(n2, block2)
    d1p = _pad_rows(d1, n1p)
    d2p = _pad_rows(d2, n2p)
    # Padding rows are invalid: +inf norm.
    n1sqp = _pad_rows(n1sq, n1p).at[n1:].set(inf)
    n2sqp = _pad_rows(n2sq, n2p).at[n2:].set(inf)

    fbest, fsecond, fidx = _reduce_one_way(
        d1p, d2p, n1sqp, n2sqp, block1, block2, interpret)
    bbest, bsecond, bidx = _reduce_one_way(
        d2p, d1p, n2sqp, n1sqp, block2, block1, interpret)
    return (fbest[:n1, 0], fsecond[:n1, 0], fidx[:n1, 0],
            bbest[:n2, 0], bsecond[:n2, 0], bidx[:n2, 0])


def nn_match_streamed(d1: jax.Array, d2: jax.Array, nn_thresh: float,
                      valid1: jax.Array | None = None,
                      valid2: jax.Array | None = None,
                      block1: int = 512, block2: int = 512,
                      interpret=False) -> jax.Array:
    """Drop-in replacement for features.match.nn_match with O(N1 + N2)
    HBM footprint. Arbitrary N1/N2 (padded internally to block
    multiples); block sizes cap VMEM at ~(block1 + block2) * 3 KB."""
    n1 = d1.shape[0]
    fbest, fsecond, fidx, bbest, bsecond, bidx = match_reduce_streamed(
        d1, d2, valid1=valid1, valid2=valid2,
        block1=block1, block2=block2, interpret=interpret)

    fwd_ok = _ratio_accept(fbest, fsecond, nn_thresh)
    bwd_ok = _ratio_accept(bbest, bsecond, nn_thresh)
    # fidx of an all-invalid row is 0 (never accepted: fbest == +inf).
    consistent = (bidx[fidx] == jnp.arange(n1, dtype=jnp.int32)) & \
        bwd_ok[fidx]
    ok = fwd_ok & consistent & jnp.isfinite(fbest)
    if valid1 is not None:
        ok = ok & valid1
    return jnp.where(ok, fidx, -1).astype(jnp.int32)
