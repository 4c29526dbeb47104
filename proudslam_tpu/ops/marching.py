"""Vectorized isosurface extraction: marching tetrahedra over per-voxel
SDF grids.

TPU-native replacement for the reference meshing path: the reference runs
CPU ``skimage.measure.marching_cubes`` per 8^3 voxel grid in a Python loop
(`src/utils/mesh_util.py:144-169`; its CUDA marching-cubes extension is
built but never imported, SURVEY.md N10). We produce the same isosurface by
6-tetrahedra cube decomposition — the tet case table (16 cases, <=2
triangles) is *derived programmatically* below instead of embedding the
256-entry marching-cubes tables, and every step is a static-shape gather /
select that vectorizes across all cubes of a voxel chunk. Invalid lanes are
masked; the host compacts the triangle soup and welds vertices.

Triangle orientation is made consistent by flipping each triangle so its
normal aligns with the local SDF gradient (pointing from negative/inside to
positive/outside).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# cube corners in (x, y, z)-bit order: corner j -> (j>>2 & 1, j>>1 & 1, j & 1)
CUBE_OFFSETS = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                         for z in (0, 1)], dtype=np.float32)

# 6-tetrahedra decomposition of the cube around the 0-7 diagonal
# (corner 0 = (0,0,0), corner 7 = (1,1,1) in the bit order above).
TETS = np.array([
    [0, 4, 6, 7],
    [0, 6, 2, 7],
    [0, 2, 3, 7],
    [0, 3, 1, 7],
    [0, 1, 5, 7],
    [0, 5, 4, 7],
], dtype=np.int32)

TET_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
                     dtype=np.int32)


def _edge_id(a: int, b: int) -> int:
    for i, (u, v) in enumerate(TET_EDGES):
        if {u, v} == {a, b}:
            return i
    raise ValueError((a, b))


def _build_tet_table() -> np.ndarray:
    """(16, 2, 3) triangle table: per sign case, up to 2 triangles of tet
    edge ids (-1 padding). Derived from first principles: the isosurface
    inside a tetrahedron separates negative corners from positive ones —
    1 vs 3 corners give one triangle, 2 vs 2 give a quad."""
    table = np.full((16, 2, 3), -1, dtype=np.int32)
    for case in range(16):
        neg = [i for i in range(4) if (case >> i) & 1]
        pos = [i for i in range(4) if not (case >> i) & 1]
        tris = []
        if len(neg) == 1:
            a = neg[0]
            tris.append([_edge_id(a, p) for p in pos])
        elif len(neg) == 3:
            a = pos[0]
            tris.append([_edge_id(a, n) for n in neg])
        elif len(neg) == 2:
            a, b = neg
            c, d = pos
            e_ac, e_ad = _edge_id(a, c), _edge_id(a, d)
            e_bc, e_bd = _edge_id(b, c), _edge_id(b, d)
            tris.append([e_ac, e_ad, e_bd])
            tris.append([e_ac, e_bd, e_bc])
        for ti, tri in enumerate(tris):
            table[case, ti] = tri
    return table


TET_TABLE = _build_tet_table()


def marching_tets_chunk(sdf: jnp.ndarray, centers: jnp.ndarray,
                        voxel_size: float
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Triangle soup for a chunk of voxels.

    Args:
      sdf: (B, R, R, R) per-voxel SDF grids sampled on
        ``linspace(-0.5, 0.5, R) * voxel_size + center`` per axis
        (reference `get_scores`, `render_helpers.py:243-294`).
      centers: (B, 3) voxel centers.

    Returns:
      verts: (B, C, 6, 2, 3, 3) triangle vertex positions (world space);
      mask:  (B, C, 6, 2) bool — valid triangles. C = (R-1)^3 cells.
    """
    B, R = sdf.shape[0], sdf.shape[1]
    r = R - 1
    C = r * r * r

    # 8 corner values per cell via shifted slices, (B, C, 8)
    corner_vals = jnp.stack([
        sdf[:, dx:dx + r, dy:dy + r, dz:dz + r].reshape(B, C)
        for dx, dy, dz in CUBE_OFFSETS.astype(np.int32)
    ], axis=-1)

    # corner positions in local grid units -> world
    ii, jj, kk = jnp.meshgrid(jnp.arange(r), jnp.arange(r), jnp.arange(r),
                              indexing="ij")
    base = jnp.stack([ii, jj, kk], axis=-1).reshape(C, 3).astype(jnp.float32)
    offs = jnp.asarray(CUBE_OFFSETS)                        # (8, 3)
    grid_pos = base[:, None, :] + offs[None, :, :]          # (C, 8, 3)
    local = (grid_pos / r - 0.5) * voxel_size               # [-vs/2, vs/2]
    corner_pos = centers[:, None, None, :] + local[None]    # (B, C, 8, 3)

    tets = jnp.asarray(TETS)                                # (6, 4)
    tet_vals = corner_vals[:, :, tets]                      # (B, C, 6, 4)
    tet_pos = corner_pos[:, :, tets]                        # (B, C, 6, 4, 3)

    bits = (tet_vals < 0).astype(jnp.int32)
    case = (bits[..., 0] + 2 * bits[..., 1] + 4 * bits[..., 2]
            + 8 * bits[..., 3])                             # (B, C, 6)

    table = jnp.asarray(TET_TABLE)                          # (16, 2, 3)
    tri_edges = table[case]                                 # (B, C, 6, 2, 3)
    valid = tri_edges[..., 0] >= 0                          # (B, C, 6, 2)

    edges = jnp.asarray(TET_EDGES)                          # (6, 2)
    ab = edges[jnp.maximum(tri_edges, 0)]                   # (B, C, 6, 2, 3, 2)
    ea, eb = ab[..., 0], ab[..., 1]                         # tet-corner ids

    N = B * C * 6
    vals = tet_vals.reshape(N, 4)
    pos = tet_pos.reshape(N, 4, 3)
    row = jnp.arange(N)[:, None, None]
    ea_f = ea.reshape(N, 2, 3)
    eb_f = eb.reshape(N, 2, 3)
    va = vals[row, ea_f]                                    # (N, 2, 3)
    vb = vals[row, eb_f]
    pa = pos[row, ea_f]                                     # (N, 2, 3, 3)
    pb = pos[row, eb_f]

    t = jnp.clip(va / (va - vb + 1e-12), 0.0, 1.0)
    verts = pa + t[..., None] * (pb - pa)
    verts = verts.reshape(B, C, 6, 2, 3, 3)

    # orient: flip triangles whose normal opposes the SDF gradient
    e1 = verts[..., 1, :] - verts[..., 0, :]
    e2 = verts[..., 2, :] - verts[..., 0, :]
    normal = jnp.cross(e1, e2)                              # (B, C, 6, 2, 3)
    # central-difference gradient per cell from corner values
    gx = (corner_vals[..., 4:8].mean(-1) - corner_vals[..., 0:4].mean(-1))
    gy = (corner_vals[..., [2, 3, 6, 7]].mean(-1)
          - corner_vals[..., [0, 1, 4, 5]].mean(-1))
    gz = (corner_vals[..., 1::2].mean(-1) - corner_vals[..., 0::2].mean(-1))
    grad = jnp.stack([gx, gy, gz], axis=-1)                 # (B, C, 3)
    flip = jnp.sum(normal * grad[:, :, None, None, :], axis=-1) < 0
    verts = jnp.where(flip[..., None, None],
                      verts[..., ::-1, :], verts)

    return verts, valid


def marching_tets(sdf_grids: np.ndarray, centers: np.ndarray,
                  voxel_size: float, chunk: int = 128
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Full extraction with host compaction + vertex welding.

    Args:
      sdf_grids: (V, R, R, R) numpy; centers: (V, 3) numpy.
    Returns:
      (verts (N, 3) float32, faces (M, 3) int32)
    """
    fn = jax.jit(marching_tets_chunk, static_argnums=(2,))
    all_tris = []
    V = sdf_grids.shape[0]
    for i in range(0, V, chunk):
        g = sdf_grids[i:i + chunk]
        c = centers[i:i + chunk]
        # skip chunks with no sign change (reference `mesh_util.py:156-157`)
        lo = g.reshape(g.shape[0], -1).min(-1)
        hi = g.reshape(g.shape[0], -1).max(-1)
        keep = (lo <= 0) & (hi >= 0)
        if not keep.any():
            continue
        g, c = g[keep], c[keep]
        pad = 0
        if g.shape[0] < chunk:
            pad = chunk - g.shape[0]
            g = np.concatenate([g, np.ones((pad,) + g.shape[1:], g.dtype)])
            c = np.concatenate([c, np.zeros((pad, 3), c.dtype)])
        verts, mask = fn(jnp.asarray(g), jnp.asarray(c), float(voxel_size))
        verts = np.asarray(verts)
        mask = np.asarray(mask)
        if pad:
            verts, mask = verts[:-pad], mask[:-pad]
        tris = verts.reshape(-1, 3, 3)[mask.reshape(-1)]
        if len(tris):
            all_tris.append(tris)
    if not all_tris:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    soup = np.concatenate(all_tris)                          # (M, 3, 3)
    # weld vertices (quantize to 1e-5 m)
    flat = soup.reshape(-1, 3)
    keys = np.round(flat / 1e-5).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    # representative positions: first occurrence of each welded vertex
    first = np.full(len(uniq), len(flat), dtype=np.int64)
    np.minimum.at(first, inv, np.arange(len(flat)))
    verts_out = flat[first].astype(np.float32)
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts_out, faces[good]
