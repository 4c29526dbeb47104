"""Point-feature render branch: per-voxel point clouds -> sample features.

TPU-native implementation of the reference's (disabled) pcd path:
``get_features_pcd`` / ``get_embeddings_pcd``
(`src/variations/render_helpers.py:168-238`) backed by the iVox point hash
(`sparse_octree/src/ivox3d.h`, ≤max_num points per voxel). Instead of a
pointer hash + KNN, points live in a fixed-capacity device array indexed by
voxel slot — insertion is a jitted scatter, and the per-sample feature is a
softmax inverse-distance blend of a PointNet MLP over the sample's voxel's
points (`models/pointnet.py`), gathered ray-structured like the trilinear
branch (`ops/interp.py::gather_ray_features`).

Selected via ``RenderSettings.feature_mode = "pcd"`` (default "vox" — the
reference also renders with the voxel branch live,
`render_helpers.py:481-484`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from proudslam_tpu.config import MapSettings
from proudslam_tpu.models.pointnet import pointnet_apply


class VoxelPointStore(NamedTuple):
    """Fixed-capacity per-voxel point storage (pytree of device arrays).

    Mirrors the reference octree's ≤``max_num`` points per SURFACE leaf
    (`octree.cpp:175`, iVox ``AddPoints`` `ivox3d.h:313-342`): first-come
    points are kept, later ones dropped once a voxel is full.
    """

    xyz: jnp.ndarray      # (V, K, 3) world positions
    rgb: jnp.ndarray      # (V, K, 3) colors in [0, 1]
    counts: jnp.ndarray   # (V,) int32 live points per voxel


def init_point_store(settings: MapSettings,
                     points_per_voxel: int = 8) -> VoxelPointStore:
    V = settings.voxel_capacity
    K = points_per_voxel
    return VoxelPointStore(
        xyz=jnp.zeros((V, K, 3), jnp.float32),
        rgb=jnp.zeros((V, K, 3), jnp.float32),
        counts=jnp.zeros((V,), jnp.int32),
    )


def insert_frame_points(store: VoxelPointStore, map_state,
                        points: jnp.ndarray, colors: jnp.ndarray,
                        valid: jnp.ndarray,
                        settings: MapSettings) -> VoxelPointStore:
    """Scatter a frame's depth cloud into its voxels' point slots.

    Args:
      map_state: ops.voxel_hash.MapState — must already contain the
        frame's voxels (call after ``insert_points``).
      points: (N, 3) world; colors: (N, 3); valid: (N,) bool.

    Points landing in a voxel keep first-come order; a voxel at capacity
    drops new points (reference ``max_num`` / iVox semantics). Within one
    call, per-voxel arrival ranks are computed with a sort over the
    (bounded) point batch — insertion runs once per frame, off the
    optimization hot path.
    """
    from proudslam_tpu.ops import voxel_hash as vh

    K = store.xyz.shape[1]
    V = store.xyz.shape[0]
    N = points.shape[0]

    coords = jnp.floor(points / settings.voxel_size).astype(jnp.int32)
    keys = vh.pack_coords(coords, settings.coord_bits)
    slots = vh.lookup_voxel_slots(map_state, keys)          # (N,) or -1
    ok = valid & (slots >= 0)
    slots = jnp.where(ok, slots, V)                         # V = drop row

    # arrival rank of each point within its voxel (stable sort by slot)
    order = jnp.argsort(slots, stable=True)
    sorted_slots = slots[order]
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_slots[1:] != sorted_slots[:-1]])
    idx_in_sorted = jnp.arange(N, dtype=jnp.int32)
    start_idx = jnp.where(seg_start, idx_in_sorted, 0)
    start_idx = jax.lax.associative_scan(jnp.maximum, start_idx)
    rank_sorted = idx_in_sorted - start_idx
    rank = jnp.zeros((N,), jnp.int32).at[order].set(rank_sorted)

    dst = store.counts[jnp.clip(slots, 0, V - 1)] + rank    # (N,)
    keep = ok & (dst < K)
    flat = jnp.where(keep, slots * K + dst, V * K)          # drop sentinel

    xyz_flat = store.xyz.reshape(V * K, 3)
    rgb_flat = store.rgb.reshape(V * K, 3)
    xyz_flat = xyz_flat.at[flat].set(points, mode="drop")
    rgb_flat = rgb_flat.at[flat].set(colors, mode="drop")

    added = jnp.zeros((V + 1,), jnp.int32).at[
        jnp.where(keep, slots, V)].add(1)[:V]
    return VoxelPointStore(
        xyz=xyz_flat.reshape(V, K, 3),
        rgb=rgb_flat.reshape(V, K, 3),
        counts=store.counts + added,
    )


def gather_pcd_features(sampled_xyz: jnp.ndarray,
                        sample_bins: jnp.ndarray,
                        hit_voxel_idx: jnp.ndarray,
                        store: VoxelPointStore,
                        pointnet_params,
                        voxel_size: float,
                        sharpness: float = 10.0) -> jnp.ndarray:
    """Per-sample features from the sample's voxel's stored points.

    Ray-structured like `ops/interp.py::gather_ray_features`: point sets
    and their PointNet features are computed **per (ray, hit-slot)** —
    R*H*K rows instead of R*S*K — then broadcast to samples with a one-hot
    contraction over the small H axis; the per-sample work is only the
    inverse-distance softmax (reference `get_embeddings_pcd`,
    `render_helpers.py:219-238`).

    Args:
      sampled_xyz: (R, S, 3) world positions (differentiable).
      sample_bins: (R, S) int — hit-slot index of each sample.
      hit_voxel_idx: (R, H) voxel slots from the intersection (-1 invalid).
    Returns:
      (R, S, D) features (zero where the voxel stores no points).
    """
    R, S, _ = sampled_xyz.shape
    H = hit_voxel_idx.shape[1]
    K = store.xyz.shape[1]

    vidx = jnp.maximum(hit_voxel_idx, 0)                    # (R, H)
    pts = store.xyz[vidx]                                   # (R, H, K, 3)
    cols = store.rgb[vidx]
    cnts = store.counts[vidx]                               # (R, H)
    feats = pointnet_apply(pointnet_params, pts, cols)      # (R, H, K, D)
    D = feats.shape[-1]

    onehot = (sample_bins[:, :, None]
              == jnp.arange(H, dtype=jnp.int32)).astype(jnp.float32)
    # per-sample point positions/features/counts of its hit voxel
    pts_s = jnp.einsum("rsh,rhkc->rskc", onehot, pts,
                       precision=jax.lax.Precision.HIGHEST)
    feats_s = jnp.einsum("rsh,rhkd->rskd", onehot, feats,
                         precision=jax.lax.Precision.HIGHEST)
    cnt_s = jnp.einsum("rsh,rh->rs", onehot,
                       cnts.astype(jnp.float32))            # (R, S)

    # softmax inverse-distance blend with the reference's half-voxel
    # sample bias (`render_helpers.py:219-238`); empty point slots are
    # pushed to -inf logits
    q = sampled_xyz + 0.5 * voxel_size
    d = jnp.linalg.norm(q[:, :, None, :] - pts_s, axis=-1)  # (R, S, K)
    live = (jnp.arange(K, dtype=jnp.float32)[None, None, :]
            < cnt_s[:, :, None])
    # finite mask value: all -inf logits would make softmax (and its
    # gradient) NaN for point-less voxels even under a downstream where
    logits = jnp.where(live, -sharpness * d, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    w = jnp.where(live, w, 0.0)                             # all-empty -> 0
    return jnp.einsum("rsk,rskd->rsd", w, feats_s,
                      precision=jax.lax.Precision.HIGHEST)
