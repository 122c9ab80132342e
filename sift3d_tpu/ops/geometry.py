"""Icosahedral geometry for gradient-histogram binning.

Builds the same regular icosahedron as the reference (12 vertices from
golden-ratio rectangles inscribed in the unit sphere, 20 triangular faces
with outward-corrected winding; reference sift3d/sift.c:215-326), and a
fully vectorized Moller-Trumbore ray/triangle intersection (cart2bary,
sift.c:335-394) that evaluates all 20 faces at once and selects the first
intersecting face - matching the reference's sequential scan order
(icos_hist_bin, sift.c:1646-1683).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import BARY_EPS, GOLDEN_RATIO, ICOS_NFACES


@functools.lru_cache(maxsize=1)
def icosahedron():
    """Returns (verts (12,3) f32 unit, faces (20,3) i32 vertex indices).

    Vertex/face tables and winding correction match init_geometry
    (sift.c:224-323) so histogram bin indices line up with the reference.
    """
    gr = GOLDEN_RATIO
    verts = np.array([
        [0, 1, gr], [0, -1, gr], [0, 1, -gr], [0, -1, -gr],
        [1, gr, 0], [-1, gr, 0], [1, -gr, 0], [-1, -gr, 0],
        [gr, 0, 1], [-gr, 0, 1], [gr, 0, -1], [-gr, 0, -1]],
        dtype=np.float64)
    faces = np.array([
        [0, 1, 8], [0, 8, 4], [0, 4, 5], [0, 5, 9], [0, 9, 1],
        [1, 6, 8], [8, 6, 10], [8, 10, 4], [4, 10, 2], [4, 2, 5],
        [5, 2, 11], [5, 11, 9], [9, 11, 7], [9, 7, 1], [1, 7, 6],
        [3, 6, 7], [3, 7, 11], [3, 11, 2], [3, 2, 10], [3, 10, 6]],
        dtype=np.int32)
    # Normalize each vertex *as used per-face* with float32 arithmetic, as
    # the reference does (CVEC_L2_NORM / CVEC_SCALE are float, sift.c:292-295)
    v32 = verts.astype(np.float32)
    norms = np.sqrt((v32 * v32).sum(-1, dtype=np.float32)).astype(np.float32)
    v32 = (v32 * (np.float32(1.0) / norms)[:, None]).astype(np.float32)

    # Fix winding so the face normal (v2-v1) x (v1-v0) points outward; the
    # reference swaps the first two *vertex positions* when the normal faces
    # inward (sift.c:298-314) but leaves tri->idx untouched, so barycentric
    # weight j is always accumulated into bin faces[i][j] of the ORIGINAL
    # ordering (MESH_HIST_GET, sift.c:61-66). We reproduce that exactly:
    # `geom` is the vertex order used for intersection/barycentrics, `faces`
    # (unswapped) is the bin-index order.
    geom = faces.copy()
    for i in range(ICOS_NFACES):
        tri = v32[geom[i]]
        n = np.cross(tri[2] - tri[1], tri[1] - tri[0])
        if np.dot(n, tri[0]) < 0:
            geom[i, 0], geom[i, 1] = geom[i, 1], geom[i, 0]
    return v32, geom, faces


@functools.lru_cache(maxsize=1)
def face_tables():
    """Static per-face arrays for vectorized intersection.

    Returns dict of float32 numpy arrays:
      v0, e1, e2: (20, 3) triangle vertex and edges (winding-corrected order)
      q: (20, 3) cross(-v0, e1) (static part of Moller-Trumbore)
      idx: (20, 3) int32 vertex indices for bin accumulation (original,
           unswapped order - see icosahedron())
      onehot: (20, 3, 12) f32 one-hot of idx
    """
    verts, geom, faces = icosahedron()
    tri = verts[geom]                        # (20, 3, 3)
    v0 = tri[:, 0]
    e1 = (tri[:, 1] - tri[:, 0]).astype(np.float32)
    e2 = (tri[:, 2] - tri[:, 0]).astype(np.float32)
    q = np.cross(-v0, e1).astype(np.float32)
    onehot = np.zeros((ICOS_NFACES, 3, 12), np.float32)
    for f in range(ICOS_NFACES):
        for j in range(3):
            onehot[f, j, faces[f, j]] = 1.0
    return dict(v0=v0, e1=e1, e2=e2, q=q, idx=faces, onehot=onehot)


@functools.lru_cache(maxsize=1)
def face_solve_tables():
    """Closed-form intersection tables.

    For a regular icosahedron centered at the origin, every face plane has
    the same distance to the center, so the face hit by a ray from the
    origin along g is simply ``argmax_f dot(g, n_f)`` over unit outward
    normals - no Moller-Trumbore scan needed. Barycentric coordinates
    follow from solving [v0 v1 v2] b = g and normalizing to sum 1
    (the intersection point is a positive multiple of g).

    Returns (normals (20, 3) f32 unit outward, vinv (20, 9) f32 row-major
    inverses of the vertex matrices).
    """
    verts, geom, _ = icosahedron()
    tri = verts[geom].astype(np.float64)                # (20, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    # Orient outward (toward the face centroid) and normalize.
    centroid = tri.mean(axis=1)
    n *= np.sign(np.sum(n * centroid, axis=1, keepdims=True))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    vmat = np.transpose(tri, (0, 2, 1))                  # columns = vertices
    vinv = np.linalg.inv(vmat).reshape(ICOS_NFACES, 9)
    return n.astype(np.float32), vinv.astype(np.float32)


def icos_hist_bin(grad: jax.Array):
    """Vectorized icosahedral binning of gradient vectors.

    Args:
      grad: (..., 3) float32 gradient vectors.

    Returns:
      face: (...,) int32 index of the first intersecting face (or 0 if none)
      bary: (..., 3) float32 barycentric coordinates on that face
      ok:   (...,) bool   - vector is large enough and intersects a face
    """
    normals, vinv = face_solve_tables()
    eps = jnp.float32(BARY_EPS)

    # Hit face = argmax of dot(g, outward unit normal): with all face
    # planes equidistant from the center, the smallest positive ray
    # parameter is the largest normal-dot. Ties (edge directions) go to
    # the lowest face index, like the reference's first-hit scan
    # (icos_hist_bin, sift.c:1646-1683); at such boundaries the barycentric
    # weight of the non-shared vertex is 0, so histograms are continuous.
    # precision=HIGHEST everywhere: TPU default matmul precision truncates
    # f32 operands to bf16, which can flip the argmax face (and thus the
    # histogram bin) - observed as ~1e-2 descriptor drift on real TPU.
    scores = jnp.matmul(grad, jnp.asarray(normals).T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (..., 20)
    face = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    # Per-voxel inverse vertex matrix via one-hot matmul (gather-free).
    oh20 = (face[..., None] ==
            jnp.arange(ICOS_NFACES, dtype=jnp.int32)).astype(jnp.float32)
    B = jnp.matmul(oh20, jnp.asarray(vinv),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)       # (..., 9)
    B = B.reshape(B.shape[:-1] + (3, 3))
    raw = jnp.einsum("...ij,...j->...i", B, grad,
                     precision=jax.lax.Precision.HIGHEST)     # V^-1 g
    s = jnp.sum(raw, axis=-1)
    s_ok = s > 0
    bary = raw / jnp.where(s_ok, s, 1.0)[..., None]

    mag_ok = jnp.sum(grad * grad, -1) >= eps
    return face, bary, s_ok & mag_ok


def vertex_weights(face: jax.Array, bary: jax.Array) -> jax.Array:
    """(..., 12) per-vertex weights: bary[j] accumulated into bin
    faces[face][j] (MESH_HIST_GET, sift.c:61-66).

    Gather-free formulation for the TPU: one-hot of the face index (a
    comparison, VPU) times three static (20, 12) matrices (MXU), instead
    of indexing the (20, 3, 12) table per element - TPU gathers of that
    size dominate the descriptor kernel otherwise.
    """
    t = face_tables()
    oh20 = (face[..., None] ==
            jnp.arange(ICOS_NFACES, dtype=face.dtype)).astype(jnp.float32)
    out = None
    for j in range(3):
        Mj = jnp.asarray(t["onehot"][:, j, :])          # (20, 12) static
        term = bary[..., j:j + 1] * jnp.matmul(
            oh20, Mj, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out = term if out is None else out + term
    return out
