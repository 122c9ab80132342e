"""Groupwise registration: synthetic solver tests + end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from sift3d_tpu.config import RansacParams, SIFT3DParams
from sift3d_tpu.register.groupwise import groupwise_solve, register_groupwise

from tests.conftest import make_blob_volume


def _make_group(rng, n_vol=4, n_pts=80, n_out=15, noise=0.05):
    """Volumes i hold points p = R_i w + t_i of world points w; volume 0 is
    the world frame, so the true A_i (vol i -> frame 0) is the inverse."""
    tforms = []
    for i in range(n_vol):
        if i == 0:
            R, t = np.eye(3), np.zeros(3)
        else:
            R = np.eye(3) + rng.normal(0, 0.03, (3, 3))
            t = rng.normal(0, 5.0, 3)
        tforms.append((R, t))

    def into(i, w):
        R, t = tforms[i]
        return w @ R.T + t

    def true_A(i):
        R, t = tforms[i]
        Ri = np.linalg.inv(R)
        return np.hstack([Ri, -(Ri @ t)[:, None]])

    edges = np.array([(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)])
    M = n_pts + n_out
    src = np.zeros((len(edges), M, 3))
    ref = np.zeros((len(edges), M, 3))
    counts = np.full(len(edges), M, np.int32)
    for e, (i, j) in enumerate(edges):
        w = rng.random((n_pts, 3)) * 100
        src[e, :n_pts] = into(i, w) + rng.normal(0, noise, (n_pts, 3))
        ref[e, :n_pts] = into(j, w) + rng.normal(0, noise, (n_pts, 3))
        # gross outliers
        src[e, n_pts:] = rng.random((n_out, 3)) * 100
        ref[e, n_pts:] = rng.random((n_out, 3)) * 100
    return edges, src, ref, counts, [true_A(i) for i in range(n_vol)]


def test_groupwise_solver_recovers_affines(rng):
    edges, src, ref, counts, want = _make_group(rng)
    res = groupwise_solve(edges, jnp.asarray(src), jnp.asarray(ref),
                          jnp.asarray(counts), num_volumes=4,
                          ransac_params=RansacParams(num_iter=200))
    assert bool(res.ok), np.asarray(res.edge_inliers)
    A = np.asarray(res.A)
    np.testing.assert_allclose(A[0], np.eye(3, 4), atol=0)
    for i in range(1, 4):
        np.testing.assert_allclose(A[i][:, :3], want[i][:, :3], atol=5e-2)
        np.testing.assert_allclose(A[i][:, 3], want[i][:, 3], atol=1.0)


def test_groupwise_consistent_with_pairwise_chain(rng):
    """With exact correspondences, the groupwise solution must equal the
    chained pairwise transforms."""
    edges, src, ref, counts, want = _make_group(rng, noise=0.0, n_out=0)
    res = groupwise_solve(edges, jnp.asarray(src), jnp.asarray(ref),
                          jnp.asarray(counts), num_volumes=4)
    A = np.asarray(res.A)
    for i in range(1, 4):
        # atol bounded by f32 normal-equation accumulation (tests run
        # with x64 off; see conftest).
        np.testing.assert_allclose(A[i], want[i], atol=5e-3)


def test_groupwise_end_to_end():
    """3 shifted copies of a volume: recover the shifts jointly."""
    from sift3d_tpu.api import Sift3D
    from sift3d_tpu.features.descriptor import Descriptors

    base = make_blob_volume((48, 48, 48), seed=17)
    shifts = [(0, 0, 0), (2, -1, 3), (-3, 2, 1)]     # (z, y, x)
    sift = Sift3D(SIFT3DParams(max_kp_per_level=1024))
    descs = []
    for s in shifts:
        vol = np.roll(base, s, axis=(0, 1, 2))
        kp = sift.detect(vol)
        descs.append(sift.extract(kp))

    # Pad descriptor sets to a common capacity and stack.
    cap = max(d.capacity for d in descs)

    def pad(d):
        def p(x):
            w = [(0, cap - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, w)
        return Descriptors(xyz=p(d.xyz), sd=p(d.sd), vec=p(d.vec),
                           count=d.count)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *[pad(d) for d in descs])

    edges = np.array([(0, 1), (1, 2), (0, 2)])
    res = register_groupwise(batch, edges, (1.0, 1.0, 1.0),
                             ssd_dtype=jnp.float32)
    assert bool(res.ok), np.asarray(res.edge_inliers)
    A = np.asarray(res.A)
    for i, s in enumerate(shifts):
        # Volume i holds point w shifted: feature at w (in base/vol 0)
        # appears at w + shift_xyz in volume i, so A_i translation = -shift.
        want_t = -np.array([s[2], s[1], s[0]], np.float64) if i else np.zeros(3)
        np.testing.assert_allclose(A[i][:, :3], np.eye(3), atol=5e-2)
        np.testing.assert_allclose(A[i][:, 3], want_t, atol=2.0)


def test_groupwise_sharded_equals_single(rng):
    """Sharded (shard_map + psum) solve == single-device solve on the
    8-device CPU mesh, including non-divisible edge counts (padding)."""
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.register.groupwise import groupwise_solve_sharded

    edges, src, ref, counts, want = _make_group(rng)   # E = 5 edges
    params = RansacParams(num_iter=200)
    res1 = groupwise_solve(edges, jnp.asarray(src), jnp.asarray(ref),
                           jnp.asarray(counts), num_volumes=4,
                           ransac_params=params)
    mesh = make_mesh(jax.devices()[:4], data=4, space=1)
    res2 = groupwise_solve_sharded(edges, jnp.asarray(src),
                                   jnp.asarray(ref), jnp.asarray(counts),
                                   num_volumes=4, mesh=mesh,
                                   ransac_params=params)
    assert bool(res2.ok)
    np.testing.assert_array_equal(np.asarray(res1.edge_inliers),
                                  np.asarray(res2.edge_inliers))
    # Not bitwise: the sharded path accumulates per-shard partial Gram
    # sums + psum (different f32 association than the single-path
    # segment_sum); centering keeps the discrepancy ~1e-5.
    np.testing.assert_allclose(np.asarray(res2.A), np.asarray(res1.A),
                               rtol=0, atol=2e-4)
    A = np.asarray(res2.A)
    for i in range(1, 4):
        np.testing.assert_allclose(A[i][:, :3], want[i][:, :3], atol=5e-2)
        np.testing.assert_allclose(A[i][:, 3], want[i][:, 3], atol=1.0)


def test_register_groupwise_sharded_end_to_end(rng):
    """Descriptor-level sharded groupwise matches the unsharded result."""
    from sift3d_tpu.api import Sift3D
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.register.groupwise import register_groupwise_sharded

    vols = [make_blob_volume((24, 24, 24), seed=s) for s in (3, 4, 5)]
    s3 = Sift3D(SIFT3DParams(max_kp_per_level=256))
    descs = []
    for v in vols:
        kp = s3.detect(v)
        descs.append(s3.extract(kp))
    cap = max(d.capacity for d in descs)
    from sift3d_tpu.features.descriptor import Descriptors
    stacked = Descriptors(
        xyz=jnp.stack([jnp.pad(d.xyz, ((0, cap - d.capacity), (0, 0)))
                       for d in descs]),
        sd=jnp.stack([jnp.pad(d.sd, (0, cap - d.capacity))
                      for d in descs]),
        vec=jnp.stack([jnp.pad(d.vec, ((0, cap - d.capacity), (0, 0)))
                       for d in descs]),
        count=jnp.stack([d.count for d in descs]))
    edges = np.array([(0, 1), (1, 2), (0, 2)])
    res1 = register_groupwise(stacked, edges, (1.0, 1.0, 1.0),
                              ransac_params=RansacParams(num_iter=100))
    mesh = make_mesh(jax.devices()[:2], data=2, space=1)
    res2 = register_groupwise_sharded(
        stacked, edges, (1.0, 1.0, 1.0), mesh,
        ransac_params=RansacParams(num_iter=100))
    np.testing.assert_allclose(np.asarray(res2.A), np.asarray(res1.A),
                               rtol=0, atol=2e-4)


def _make_fleet(rng, n_vol=64, n_pts=24, n_out=3, noise=0.02):
    """Config-5-shaped synthetic fleet: N volumes, star + loop edges."""
    tforms = [(np.eye(3), np.zeros(3))]
    for _ in range(1, n_vol):
        R = np.eye(3) + rng.normal(0, 0.02, (3, 3))
        t = rng.normal(0, 4.0, 3)
        tforms.append((R, t))

    def into(i, w):
        R, t = tforms[i]
        return w @ R.T + t

    def true_A(i):
        R, t = tforms[i]
        Ri = np.linalg.inv(R)
        return np.hstack([Ri, -(Ri @ t)[:, None]])

    star = [(0, i) for i in range(1, n_vol)]
    # loop edges distinct from the star's (0, 1): 1-2-...-63-0
    loop = [(i, i + 1) for i in range(1, n_vol - 1)] + [(n_vol - 1, 0)]
    edges = np.array(star + loop)
    M = n_pts + n_out
    src = np.zeros((len(edges), M, 3))
    ref = np.zeros((len(edges), M, 3))
    for e, (i, j) in enumerate(edges):
        w = rng.random((n_pts, 3)) * 100
        src[e, :n_pts] = into(i, w) + rng.normal(0, noise, (n_pts, 3))
        ref[e, :n_pts] = into(j, w) + rng.normal(0, noise, (n_pts, 3))
        src[e, n_pts:] = rng.random((n_out, 3)) * 100
        ref[e, n_pts:] = rng.random((n_out, 3)) * 100
    counts = np.full(len(edges), M, np.int32)
    return edges, src, ref, counts, [true_A(i) for i in range(n_vol)]


def test_groupwise_config5_scale_with_resume(rng, tmp_path):
    """Config-5 shape on the virtual mesh: 64 volumes, star + loop edges
    (127 edges) sharded over 8 devices, with the matching phase
    checkpointed through a simulated preemption, and the groupwise
    solution checked for consistency against a chained pairwise solution
    (BASELINE.md config 5; SURVEY §5.4, §5.8)."""
    from sift3d_tpu.parallel import make_mesh
    from sift3d_tpu.register.groupwise import groupwise_solve_sharded
    from sift3d_tpu.register.ransac import find_tform_ransac
    from sift3d_tpu.utils.checkpoint import GroupwiseCheckpoint

    n_vol = 64
    edges, src, ref, counts, want = _make_fleet(rng, n_vol=n_vol)
    params = RansacParams(num_iter=60)

    # --- matching phase, preempted after 60 of 127 edges ---
    ckpt = GroupwiseCheckpoint(tmp_path / "gw")

    class Preempted(Exception):
        pass

    def run_matching(kill_after=None):
        done = 0
        for e, (i, j) in enumerate(edges):
            if ckpt.has(i, j):
                continue                       # resume: skip finished work
            ckpt.put(i, j, src[e], ref[e], counts[e])
            done += 1
            if kill_after is not None and done >= kill_after:
                raise Preempted()

    try:
        run_matching(kill_after=60)
        assert False, "should have been preempted"
    except Preempted:
        pass
    assert len(ckpt.edges()) == 60
    run_matching()                             # relaunch: completes the rest
    assert len(ckpt.edges()) == len(edges)

    # --- sharded solve phase from the checkpoint store ---
    src_c, ref_c, cnt_c = ckpt.gather([tuple(e) for e in edges])
    np.testing.assert_array_equal(src_c, src)   # npz round-trip is exact
    mesh = make_mesh(jax.devices(), data=8, space=1)
    res = groupwise_solve_sharded(edges, jnp.asarray(src_c),
                                  jnp.asarray(ref_c), jnp.asarray(cnt_c),
                                  num_volumes=n_vol, mesh=mesh,
                                  ransac_params=params)
    assert bool(res.ok), np.asarray(res.edge_inliers)
    A = np.asarray(res.A)
    for i in range(1, n_vol):
        np.testing.assert_allclose(A[i][:, :3], want[i][:, :3], atol=5e-2)
        np.testing.assert_allclose(A[i][:, 3], want[i][:, 3], atol=1.0)

    # --- consistency: groupwise beats (or matches) the pairwise chain ---
    # Chain volume k -> 0 along 0 <- 1 <- ... <- k (star edge (0,1) then
    # loop edges); pairwise errors compound along the chain, the joint
    # solve's do not. Per-edge A maps volume-j coords to volume-i coords.
    loop_off = n_vol - 1                       # loop edges follow the star
    k = n_vol // 2                             # far down the loop
    chain_edges = [0] + [loop_off + i for i in range(k - 1)]
    A_edge = []
    for e in chain_edges:                      # (0,1), (1,2), ..., (k-1,k)
        r = find_tform_ransac(jnp.asarray(src[e]), jnp.asarray(ref[e]),
                              jnp.asarray(counts[e]), params)
        A_edge.append(np.asarray(r.A))

    def compose(Aij, Ajk):                     # (i<-j) o (j<-k)
        L = Aij[:, :3] @ Ajk[:, :3]
        t = Aij[:, :3] @ Ajk[:, 3] + Aij[:, 3]
        return np.hstack([L, t[:, None]])

    chain = A_edge[0]                          # 0 <- 1
    for Ae in A_edge[1:]:
        chain = compose(chain, Ae)             # 0 <- next volume
    err_chain = np.abs(chain - want[k]).max()
    err_group = np.abs(A[k] - want[k]).max()
    assert err_group <= err_chain + 1e-3, (err_group, err_chain)
