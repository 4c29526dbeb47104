"""Mesh extraction from the neural voxel map.

Re-design of `MeshExtractor` (`src/utils/mesh_util.py:80-169`) +
`get_scores`/`eval_points` (`src/variations/render_helpers.py:243-328`):

1. decode a per-voxel R^3 SDF/color grid by trilinear feature gather + MLP
   (chunked, jitted);
2. isosurface via vectorized marching tetrahedra (`ops/marching.py`) —
   the reference loops CPU skimage marching_cubes per voxel;
3. optional mesh cleaning: keep faces whose vertices are near the observed
   depth point cloud (cKDTree ball query, reference `mesh_util.py:90-102`);
4. optional vertex colors by re-querying the decoder at vertex positions
   using the containing voxel (reference `mesh_util.py:104-133`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import DecoderSettings, MapSettings
from proudslam_tpu.models.decoder import decoder_values
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.ops.interp import gather_voxel_features
from proudslam_tpu.ops.marching import marching_tets


@dataclasses.dataclass
class Mesh:
    verts: np.ndarray                 # (N, 3) float32
    faces: np.ndarray                 # (M, 3) int32
    colors: Optional[np.ndarray] = None  # (N, 3) float32 in [0,1]


def grid_scores(map_state: vh.MapState, decoder_params,
                map_settings: MapSettings, decoder_settings: DecoderSettings,
                res: int = 8, chunk: int = 32) -> Tuple[np.ndarray, np.ndarray]:
    """Per-voxel (res, res, res, 4) rgb+sdf grids for all live voxels.

    Sampling layout matches `get_scores` (`render_helpers.py:251-262`):
    linspace(-0.5, 0.5, res) * voxel_size per axis around each center.
    Returns (grids (V, res, res, res, 4), centers (V, 3)) as numpy.
    """
    num = int(map_state.num_voxels)
    centers_all = np.asarray(
        vh.voxel_centers(map_state, map_settings))[:num]

    lin = np.linspace(-0.5, 0.5, res) * map_settings.voxel_size
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    local = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)

    # map state passed as an argument — jitted functions must not close
    # over device arrays (constant embedding fetches them D2H)
    @jax.jit
    def decode_chunk(state, dec_params, centers, vidx):
        pts = centers[:, None, :] + jnp.asarray(local)[None]  # (B, res^3, 3)
        B = centers.shape[0]
        idx = jnp.broadcast_to(vidx[:, None], (B, res ** 3)).reshape(-1)
        feats = gather_voxel_features(
            pts.reshape(-1, 3), idx,
            vh.voxel_centers(state, map_settings),
            state.voxel_vertex_ids, state.embeddings,
            map_settings.voxel_size)
        out = decoder_values(dec_params, decoder_settings, feats)
        return out.reshape(B, res, res, res, 4)

    grids = []
    for i in range(0, num, chunk):
        c = centers_all[i:i + chunk]
        vidx = np.arange(i, i + c.shape[0], dtype=np.int32)
        pad = chunk - c.shape[0]
        if pad:
            c = np.concatenate([c, np.zeros((pad, 3), c.dtype)])
            vidx = np.concatenate([vidx, np.zeros((pad,), np.int32)])
        g = np.asarray(decode_chunk(map_state, decoder_params,
                                    jnp.asarray(c, jnp.float32),
                                    jnp.asarray(vidx)))
        grids.append(g[:chunk - pad] if pad else g)
    if not grids:
        return (np.zeros((0, res, res, res, 4), np.float32),
                centers_all)
    return np.concatenate(grids), centers_all


def eval_vertex_colors(map_state: vh.MapState, decoder_params,
                       map_settings: MapSettings,
                       decoder_settings: DecoderSettings,
                       verts: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """Decoder RGB at vertex positions via their containing voxel
    (reference `eval_points`, `render_helpers.py:297-328`)."""
    coords = np.floor(verts / map_settings.voxel_size).astype(np.int32)
    keys = vh.pack_coords(jnp.asarray(coords))
    slots = np.asarray(vh.lookup_voxel_slots(map_state, keys))
    valid = slots >= 0

    @jax.jit
    def decode(state, dec_params, pts, idx):
        feats = gather_voxel_features(
            pts, idx, vh.voxel_centers(state, map_settings),
            state.voxel_vertex_ids, state.embeddings,
            map_settings.voxel_size)
        return decoder_values(dec_params, decoder_settings, feats)[:, :3]

    colors = np.zeros((len(verts), 3), np.float32)
    idx_all = np.maximum(slots, 0)
    for i in range(0, len(verts), chunk):
        pts = jnp.asarray(verts[i:i + chunk], jnp.float32)
        idx = jnp.asarray(idx_all[i:i + chunk])
        colors[i:i + chunk] = np.asarray(
            decode(map_state, decoder_params, pts, idx))
    colors[~valid] = 0.0
    return colors


def clean_mesh_faces(verts: np.ndarray, faces: np.ndarray,
                     depth_points: np.ndarray, radius: float) -> np.ndarray:
    """Keep faces with any vertex within ``radius`` of the observed depth
    cloud (reference `mesh_util.py:90-102`)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(depth_points)
    counts = tree.query_ball_point(verts, radius, return_length=True)
    vert_ok = np.asarray(counts) > 0
    return faces[vert_ok[faces].any(axis=-1)]


def downsample_points(points: np.ndarray, cell: float = 0.01) -> np.ndarray:
    """Voxel-grid downsample (replaces open3d voxel_down_sample,
    `mesh_util.py:22-26`)."""
    keys = np.floor(points / cell).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    return points[first]


def extract_mesh(map_state: vh.MapState, decoder_params,
                 map_settings: MapSettings,
                 decoder_settings: DecoderSettings,
                 res: int = 8,
                 depth_points: Optional[np.ndarray] = None,
                 require_color: bool = True) -> Mesh:
    """Full pipeline (reference `Mapping.extract_mesh`, `mapping.py:421-442`)."""
    grids, centers = grid_scores(
        map_state, decoder_params, map_settings, decoder_settings, res=res)
    sdf = grids[..., 3]
    verts, faces = marching_tets(sdf, centers, map_settings.voxel_size)
    if depth_points is not None and len(verts):
        pts = downsample_points(depth_points)
        faces = clean_mesh_faces(
            verts, faces, pts, map_settings.voxel_size * 0.5)
    colors = None
    if require_color and len(verts):
        colors = eval_vertex_colors(
            map_state, decoder_params, map_settings, decoder_settings, verts)
    return Mesh(verts=verts, faces=faces, colors=colors)


def save_ply(path: str, mesh: Mesh) -> None:
    """Minimal binary-less PLY writer (open3d is unavailable here)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(mesh.verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if mesh.colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write(f"element face {len(mesh.faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        if mesh.colors is not None:
            cols = np.clip(mesh.colors * 255, 0, 255).astype(np.uint8)
            for v, c in zip(mesh.verts, cols):
                f.write(f"{v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for v in mesh.verts:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in mesh.faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
