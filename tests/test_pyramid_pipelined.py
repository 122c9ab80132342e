"""Octave-pipelined (composed-operator) pyramid builder vs sequential.

SURVEY §5.7 flags the sequential octave dependency (reference
sift.c:1029-1042) for pipelining. pyramid.build_gpyr_pipelined breaks it
by composing the per-axis blur matrices and the strided downsample-pick
rows on the host (exact in float64), so every level is a depth-3 chain
from the input instead of depth 1 + num_octaves * (num_gpyr_levels - 2).
These tests pin (a) float32-rounding-level equality with the sequential
builder - much tighter than the 2e-3 golden tolerance - on anisotropic,
non-cubic inputs, (b) the same for the batched mesh variant, and (c) the
static dependency-depth win.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sift3d_tpu import pyramid as pyr_mod
from sift3d_tpu.config import SIFT3DParams


def _volume(shape, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(shape).astype(np.float32)
    # Smooth a little so values resemble image data, then im_scale.
    v = (v + np.roll(v, 1, 0) + np.roll(v, 1, 1) + np.roll(v, 1, 2)) / 4
    return np.asarray(pyr_mod.im_scale(jnp.asarray(v)))


@pytest.mark.parametrize("shape,units", [
    ((32, 32, 32), (1.0, 1.0, 1.0)),
    ((40, 32, 24), (1.0, 1.5, 2.0)),     # non-cubic, anisotropic
])
def test_pipelined_equals_sequential(shape, units):
    params = SIFT3DParams()
    plan = pyr_mod.plan_pyramid(shape[::-1], units, params)
    vol = jnp.asarray(_volume(shape))
    seq = jax.jit(lambda v: pyr_mod.build_gpyr(v, plan))(vol)
    pip = jax.jit(lambda v: pyr_mod.build_gpyr_pipelined(v, plan))(vol)
    assert set(seq) == set(pip)
    for key in seq:
        np.testing.assert_allclose(
            np.asarray(pip[key]), np.asarray(seq[key]), atol=2e-6,
            err_msg=f"level {key}")


def test_pipelined_batched_equals_sequential():
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.parallel.pipeline import build_gpyr_batched

    params = SIFT3DParams()
    shape = (32, 32, 32)
    plan = pyr_mod.plan_pyramid(shape, (1.0, 1.0, 1.0), params)
    vols = jnp.stack([jnp.asarray(_volume(shape, seed=s))
                      for s in range(4)])
    mesh = make_mesh(jax.devices(), data=len(jax.devices()), space=1)
    seq = jax.jit(lambda v: build_gpyr_batched(v, plan, mesh))(vols)
    pip = jax.jit(lambda v: build_gpyr_batched(v, plan, mesh,
                                               pipelined=True))(vols)
    for key in seq:
        np.testing.assert_allclose(
            np.asarray(pip[key]), np.asarray(seq[key]), atol=2e-6,
            err_msg=f"level {key}")


def test_dependency_depth():
    """The static pipelining win: every level is reachable from the input
    in <= 3 composed separable convolutions, octave-independent."""
    params = SIFT3DParams()
    plan = pyr_mod.plan_pyramid((64, 64, 64), (1.0, 1.0, 1.0), params)
    seed_ops, level_ops = pyr_mod.composed_pyramid_operators(plan)
    assert len(seed_ops) == plan.num_octaves
    assert seed_ops[0] is None                     # octave 0 = the seed
    for o in range(1, plan.num_octaves):
        nx, ny, nz = plan.octave_dims(o)
        shapes = tuple(m.shape for m in seed_ops[o])
        assert shapes == ((nx, plan.dims[0]), (ny, plan.dims[1]),
                          (nz, plan.dims[2]))
    for o in range(plan.num_octaves):
        nx, ny, nz = plan.octave_dims(o)
        for s in range(plan.first_level + 1, plan.last_gpyr_level + 1):
            shapes = tuple(m.shape for m in level_ops[(o, s)])
            assert shapes == ((nx, nx), (ny, ny), (nz, nz))
    seq_depth = 1 + plan.num_octaves * (plan.num_gpyr_levels - 2)
    assert seq_depth > 3          # sequential: 1 + 4*4 = 17 convs at 64^3
