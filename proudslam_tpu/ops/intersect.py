"""Ray–voxel intersection: TPU-native replacement for the CUDA octree DFS.

The reference traverses a flattened octree per ray with a stack-based DFS
(`sparse_voxels/src/intersect_gpu.cu:191-270`), then sorts hits by entry
depth and truncates (`voxel_helpers.py:557-595`). A divergent DFS is a poor
fit for the VPU; with a capacity-bounded voxel set (~20k) a fully fused
brute-force slab test is bandwidth-trivial: one (R, V) entry-depth matrix
(XLA fuses the 3-axis slab arithmetic into its production) followed by a
single hardware-friendly ``lax.approx_min_k`` selection of the K closest
hits per ray. Exit depths are recomputed for just the selected voxels.

Semantics match the reference post-processing:
* slab entry depth clamped to >= 0 (`intersect_gpu.cu:82`, ``f_low = 0``);
* hits with entry depth > max_distance dropped (`voxel_helpers.py:578`);
* output sorted ascending by entry depth, idx == -1 for empty slots.

``ray_intersect_scan`` keeps the chunked-scan exact variant (lower peak
memory; used as the cross-check oracle, mirroring the reference's own
octree-vs-AABB property test `src/variations/test_aabb.py`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from proudslam_tpu.config import RenderSettings


class Intersections(NamedTuple):
    """Per-ray sorted voxel hits (all (R, H))."""

    t_near: jnp.ndarray     # entry depth (max_distance where invalid)
    t_far: jnp.ndarray      # exit depth  (max_distance where invalid)
    voxel_idx: jnp.ndarray  # voxel slot, -1 where invalid
    hit_mask: jnp.ndarray   # (R,) bool — ray hit at least one voxel


def ray_box_slab(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                 centers: jnp.ndarray, half: float):
    """Vectorized slab test: rays (R, 3) x boxes (V, 3) -> (R, V) tnear/tfar/hit.

    Matches `RayAABBIntersection` (`intersect_gpu.cu:75-140`): entry clamped
    to 0, miss encoded by ``hit == False``.
    """
    inv_d = 1.0 / rays_d                                  # (R, 3); inf ok
    lo = (centers[None, :, :] - half - rays_o[:, None, :]) * inv_d[:, None, :]
    hi = (centers[None, :, :] + half - rays_o[:, None, :]) * inv_d[:, None, :]
    t1 = jnp.minimum(lo, hi)
    t2 = jnp.maximum(lo, hi)
    # 0 * inf -> NaN when the ray lies exactly on a slab plane of a
    # zero-component axis; the reference's ternary comparisons silently
    # skip such axes (`intersect_gpu.cu:118-133` — NaN compares false),
    # i.e. the axis imposes no constraint. Replicate explicitly.
    t1 = jnp.where(jnp.isnan(t1), -jnp.inf, t1)
    t2 = jnp.where(jnp.isnan(t2), jnp.inf, t2)
    t_near = jnp.maximum(jnp.max(t1, axis=-1), 0.0)       # f_low starts at 0
    t_far = jnp.min(t2, axis=-1)
    hit = t_near <= t_far
    return t_near, t_far, hit


def _slab_axis(o, d, c, half):
    """Per-axis slab interval with the NaN -> no-constraint rule."""
    inv = 1.0 / d
    lo = (c - half - o) * inv
    hi = (c + half - o) * inv
    t1 = jnp.minimum(lo, hi)
    t2 = jnp.maximum(lo, hi)
    t1 = jnp.where(jnp.isnan(t1), -jnp.inf, t1)
    t2 = jnp.where(jnp.isnan(t2), jnp.inf, t2)
    return t1, t2


def ray_intersect(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  centers: jnp.ndarray, voxel_valid: jnp.ndarray,
                  settings: RenderSettings,
                  exact: bool = False) -> Intersections:
    """Intersect rays with all valid voxels; K closest hits, depth-sorted.

    Args:
      rays_o, rays_d: (R, 3) world-space rays (directions unnormalized).
      centers: (V, 3) voxel centers (padded slots allowed).
      voxel_valid: (V,) bool — live voxel slots.
      exact: use exact ``lax.top_k`` selection instead of the TPU-fast
        ``lax.approx_min_k`` (recall ~0.95+; the reference itself truncates
        hits arbitrarily at 50 in DFS order, `voxel_helpers.py:561`).
    """
    H = settings.max_hits
    half = settings.voxel_size * 0.5
    BIG = jnp.float32(settings.max_depth_sentinel)

    # fused entry-depth matrix, axis at a time (keeps peak memory at one
    # (R, V) f32 array; XLA fuses the arithmetic into its production)
    tn = None
    tf = None
    for a in range(3):
        t1, t2 = _slab_axis(rays_o[:, a:a + 1], rays_d[:, a:a + 1],
                            centers[None, :, a], half)
        tn = t1 if tn is None else jnp.maximum(tn, t1)
        tf = t2 if tf is None else jnp.minimum(tf, t2)
    tn = jnp.maximum(tn, 0.0)
    hit = (tn <= tf) & voxel_valid[None, :] & (tn <= settings.max_distance)
    score = jnp.where(hit, tn, BIG)                       # (R, V)

    V = centers.shape[0]
    if V <= H:  # selection needs k < n; pad with always-invalid columns
        score = jnp.pad(score, ((0, 0), (0, H + 1 - V)),
                        constant_values=BIG)
    if exact:
        neg, idx = jax.lax.top_k(-score, H)
        t_near = -neg
    else:
        t_near, idx = jax.lax.approx_min_k(
            score, H, recall_target=0.95, aggregate_to_topk=True)
    idx = jnp.minimum(idx.astype(jnp.int32), V - 1)

    # recompute exit depths for the selected voxels only. Three 1-D gathers
    # (one per axis) beat a (V, 3) row gather on TPU.
    sel_centers = jnp.stack(
        [centers[:, a][idx] for a in range(3)], axis=-1)  # (R, H, 3)
    _, tf2, _ = ray_box_slab_pairs(rays_o, rays_d, sel_centers, half)

    invalid = t_near >= BIG
    voxel_idx = jnp.where(invalid, -1, idx)
    t_near = jnp.where(invalid, settings.max_distance, t_near)
    t_far = jnp.where(invalid, settings.max_distance, tf2)
    hit_mask = jnp.any(~invalid, axis=-1)
    return Intersections(t_near=t_near, t_far=t_far, voxel_idx=voxel_idx,
                         hit_mask=hit_mask)


def ray_box_slab_pairs(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       centers: jnp.ndarray, half: float):
    """Slab test for per-ray candidate boxes: rays (R, 3) x boxes (R, H, 3)."""
    inv_d = 1.0 / rays_d[:, None, :]
    lo = (centers - half - rays_o[:, None, :]) * inv_d
    hi = (centers + half - rays_o[:, None, :]) * inv_d
    t1 = jnp.minimum(lo, hi)
    t2 = jnp.maximum(lo, hi)
    t1 = jnp.where(jnp.isnan(t1), -jnp.inf, t1)
    t2 = jnp.where(jnp.isnan(t2), jnp.inf, t2)
    t_near = jnp.maximum(jnp.max(t1, axis=-1), 0.0)
    t_far = jnp.min(t2, axis=-1)
    return t_near, t_far, t_near <= t_far


def dda_num_points(settings: RenderSettings) -> int:
    """Static march-point count covering t <= max_distance for any ray with
    |d| <= dda_dir_bound (rounded up to a multiple of 8 for TPU tiling)."""
    m = settings.max_distance * settings.dda_dir_bound / (
        settings.dda_step_frac * settings.voxel_size)
    return (int(m) + 2 + 7) // 8 * 8


def build_occupancy(voxel_keys: jnp.ndarray, num_voxels: jnp.ndarray,
                    settings: RenderSettings) -> jnp.ndarray:
    """Dense voxel-slot grid: (prod(grid_dims),) int32, -1 where empty.

    Scatter of the (unique) live voxel keys into the configured extent.
    O(V) — and loop-invariant in the Adam scans, so XLA hoists it to once
    per step call. Voxels outside the extent are unreachable by the DDA
    path (size `grid_dims` generously; `intersect_mode="brute"` has no
    extent limit).
    """
    from proudslam_tpu.ops.voxel_hash import unpack_key

    gx, gy, gz = settings.grid_dims
    ox, oy, oz = settings.grid_origin
    total = gx * gy * gz
    V = voxel_keys.shape[0]
    coords = unpack_key(voxel_keys)
    cx = coords[:, 0] - ox
    cy = coords[:, 1] - oy
    cz = coords[:, 2] - oz
    ok = ((cx >= 0) & (cx < gx) & (cy >= 0) & (cy < gy)
          & (cz >= 0) & (cz < gz)
          & (jnp.arange(V, dtype=jnp.int32) < num_voxels))
    lin = (cx * gy + cy) * gz + cz
    lin = jnp.where(ok, lin, total)
    occ = jnp.full((total + 1,), -1, dtype=jnp.int32)
    occ = occ.at[lin].set(jnp.arange(V, dtype=jnp.int32), mode="drop")
    return occ[:total]


def ray_intersect_dda(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                      voxel_keys: jnp.ndarray, num_voxels: jnp.ndarray,
                      settings: RenderSettings,
                      occupancy: jnp.ndarray = None) -> Intersections:
    """Grid-marching intersection: O(path length) per ray, V-independent.

    TPU-native replacement of the reference's per-ray octree DFS
    (`intersect_gpu.cu:191-270`): march each ray at a fixed euclidean
    spacing (< voxel_size/2), look every point up in a dense occupancy
    grid, and take the first K distinct voxels — which are exactly the K
    nearest since march order is depth order. Entry/exit depths are then
    recomputed exactly (slab test) for just the selected voxels, so the
    output matches :func:`ray_intersect` semantics bit-for-bit up to
    corner grazes (voxels whose in-voxel chord is shorter than the march
    spacing may be skipped; such segments contribute ~nothing to the
    render integral, and the reference's own DFS truncates hits
    arbitrarily at 50).
    """
    from proudslam_tpu.ops.voxel_hash import unpack_key

    H = settings.max_hits
    vox = settings.voxel_size
    half = vox * 0.5
    gx, gy, gz = settings.grid_dims
    ox, oy, oz = settings.grid_origin
    total = gx * gy * gz
    M = dda_num_points(settings)

    if occupancy is None:
        occupancy = build_occupancy(voxel_keys, num_voxels, settings)
    occ_pad = jnp.concatenate(
        [occupancy, jnp.full((1,), -1, jnp.int32)])

    # march points at euclidean spacing dda_step_frac * voxel_size
    dnorm = jnp.sqrt(jnp.sum(rays_d * rays_d, axis=-1, keepdims=True))
    step_t = (settings.dda_step_frac * vox) / jnp.maximum(dnorm, 1e-12)
    t = jnp.arange(M, dtype=jnp.float32)[None, :] * step_t        # (R, M)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]  # (R, M, 3)
    c = jnp.floor(pts * (1.0 / vox)).astype(jnp.int32)
    cx = c[..., 0] - ox
    cy = c[..., 1] - oy
    cz = c[..., 2] - oz
    in_range = ((cx >= 0) & (cx < gx) & (cy >= 0) & (cy < gy)
                & (cz >= 0) & (cz < gz) & (t <= settings.max_distance))
    lin = jnp.where(in_range, (cx * gy + cy) * gz + cz, total)    # (R, M)
    slot = occ_pad[lin]                                           # (R, M)

    # first marched point of each visited cell (a line's span inside an
    # AABB is one interval, so runs of equal lin are contiguous)
    new_run = jnp.concatenate(
        [jnp.ones_like(lin[:, :1], bool), lin[:, 1:] != lin[:, :-1]], axis=1)
    hit = (slot >= 0) & new_run
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1          # (R, M)
    keep = hit & (rank < H)

    # compact to (R, H) by rank (one-hot masked sum — fused on the VPU)
    onehot = keep[:, :, None] & (
        rank[:, :, None] == jnp.arange(H, dtype=jnp.int32))       # (R, M, H)
    idx = jnp.sum(jnp.where(onehot, slot[:, :, None], 0), axis=1,
                  dtype=jnp.int32)                                # (R, H)
    n_hits = jnp.sum(keep.astype(jnp.int32), axis=1)              # (R,)
    sel_valid = jnp.arange(H, dtype=jnp.int32)[None, :] < n_hits[:, None]

    # exact entry/exit depths for the selected voxels only
    sel_keys = voxel_keys[jnp.clip(idx, 0, voxel_keys.shape[0] - 1)]
    centers = (unpack_key(sel_keys).astype(jnp.float32) + 0.5) * vox
    tn, tf, _ = ray_box_slab_pairs(rays_o, rays_d, centers, half)
    sel_valid &= tn <= settings.max_distance

    voxel_idx = jnp.where(sel_valid, idx, -1)
    t_near = jnp.where(sel_valid, tn, settings.max_distance)
    t_far = jnp.where(sel_valid, tf, settings.max_distance)
    hit_mask = jnp.any(sel_valid, axis=-1)
    return Intersections(t_near=t_near, t_far=t_far, voxel_idx=voxel_idx,
                         hit_mask=hit_mask)


def ray_intersect_scan(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       centers: jnp.ndarray, voxel_valid: jnp.ndarray,
                       settings: RenderSettings,
                       chunk: int = 4096) -> Intersections:
    """Exact chunked-scan variant (running per-ray top-K merge)."""
    R = rays_o.shape[0]
    V = centers.shape[0]
    H = settings.max_hits
    half = settings.voxel_size * 0.5
    BIG = jnp.float32(settings.max_depth_sentinel)

    num_chunks = -(-V // chunk)
    pad = num_chunks * chunk - V
    centers_p = jnp.pad(centers, ((0, pad), (0, 0)))
    valid_p = jnp.pad(voxel_valid, (0, pad))
    centers_c = centers_p.reshape(num_chunks, chunk, 3)
    valid_c = valid_p.reshape(num_chunks, chunk)
    base_idx = (jnp.arange(num_chunks, dtype=jnp.int32) * chunk)

    init = (
        jnp.full((R, H), BIG, dtype=jnp.float32),
        jnp.full((R, H), BIG, dtype=jnp.float32),
        jnp.full((R, H), -1, dtype=jnp.int32),
    )

    def scan_body(carry, inputs):
        best_tn, best_tf, best_idx = carry
        c_centers, c_valid, c_base = inputs
        tn, tf, hit = ray_box_slab(rays_o, rays_d, c_centers, half)
        hit = hit & c_valid[None, :] & (tn <= settings.max_distance)
        tn = jnp.where(hit, tn, BIG)
        tf = jnp.where(hit, tf, BIG)
        idx = jnp.where(
            hit, c_base + jnp.arange(chunk, dtype=jnp.int32)[None, :], -1)
        cand_tn = jnp.concatenate([best_tn, tn], axis=1)
        cand_tf = jnp.concatenate([best_tf, tf], axis=1)
        cand_idx = jnp.concatenate([best_idx, idx], axis=1)
        neg_top, top_pos = jax.lax.top_k(-cand_tn, H)
        best_tn = -neg_top
        best_tf = jnp.take_along_axis(cand_tf, top_pos, axis=1)
        best_idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
        return (best_tn, best_tf, best_idx), None

    (t_near, t_far, voxel_idx), _ = jax.lax.scan(
        scan_body, init, (centers_c, valid_c, base_idx))

    invalid = voxel_idx < 0
    t_near = jnp.where(invalid, settings.max_distance, t_near)
    t_far = jnp.where(invalid, settings.max_distance, t_far)
    hit_mask = jnp.any(~invalid, axis=-1)
    return Intersections(t_near=t_near, t_far=t_far, voxel_idx=voxel_idx,
                         hit_mask=hit_mask)
