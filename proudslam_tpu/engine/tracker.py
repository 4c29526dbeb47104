"""Frame-to-model tracking: SE(3) pose optimization against the map.

Re-design of `track_frame` (`src/variations/render_helpers.py:679-761`):
a single jitted `lax.scan` over ``num_iterations`` Adam steps on the 6-dof
pose tangent. Each iteration re-samples a fresh Gumbel-top-k pixel batch
(like the reference), renders the rays against the *frozen* map, and steps
the pose on the photometric + depth + SDF loss with depth-variance outlier
weighting (`tracking.py:146`).

Pose gradients flow only through ``sampled_xyz = o + R d * stop_grad(z)`` —
matching the reference's non-differentiable sampling.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from proudslam_tpu.config import SystemSettings
from proudslam_tpu.engine.adam import B1, B2, EPS
from proudslam_tpu.geometry import se3
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.ops.sampling import sample_frame_pixels
from proudslam_tpu.render.losses import compute_loss
from proudslam_tpu.render.renderer import render_rays


class TrackResult(NamedTuple):
    pose: jnp.ndarray       # (6,) refined tangent
    adam_m: jnp.ndarray     # (6,) final Adam moments (seed BA warm start)
    adam_v: jnp.ndarray     # (6,)
    adam_t: jnp.ndarray     # () int32
    loss: jnp.ndarray       # () final-iteration loss
    hit_ratio: jnp.ndarray  # () fraction of rays that hit the map


def track_frame(map_state: vh.MapState, decoder_params,
                prev_pose: jnp.ndarray, rays_dir: jnp.ndarray,
                rgb: jnp.ndarray, depth: jnp.ndarray,
                key: jax.Array, settings: SystemSettings,
                mesh=None, point_store=None,
                fresh_thresh: jnp.ndarray = None) -> TrackResult:
    """Track one RGB-D frame starting from the previous frame's pose.

    Args:
      prev_pose: (6,) tangent of the last tracked pose (constant-position
        motion model, reference `tracking.py:130-131`).
      rays_dir: (H, W, 3) camera-frame pixel ray directions.
      rgb: (H, W, 3); depth: (H, W).
      mesh: optional ``jax.sharding.Mesh`` with ("dp", "mp") axes — ray
        batches shard over dp, the embedding table over mp
        (`parallel/engine.py`); None = single-device, no constraints.
    """
    from proudslam_tpu.parallel.engine import shard_embeddings, shard_ray_batch

    trk = settings.tracker
    rnd = settings.render
    n_rays = trk.n_rays
    SJ = rnd.max_samples - rnd.max_hits
    if rnd.fresh_window_frames <= 0:
        fresh_thresh = None      # static gate: margin/off modes ignore it

    map_state = map_state._replace(
        embeddings=shard_embeddings(mesh, map_state.embeddings))

    # dda occupancy grid is frozen across the pose iterations — build once
    occupancy = None
    if rnd.intersect_mode == "dda":
        from proudslam_tpu.ops.intersect import build_occupancy
        occupancy = build_occupancy(map_state.voxel_keys,
                                    map_state.num_voxels, rnd)
    # embeddings are frozen in tracking: hoist the per-voxel corner view
    # out of the pose scan (XLA does not hoist the gather itself)
    corner_feats = None
    if rnd.feature_mode != "pcd":
        from proudslam_tpu.ops.interp import corner_view
        corner_feats = corner_view(map_state.embeddings,
                                   map_state.voxel_vertex_ids, None)

    dirs_flat = rays_dir.reshape(-1, 3)
    rgb_flat = rgb.reshape(-1, 3)
    depth_flat = depth.reshape(-1)

    def loss_fn(pose6, dirs, gt_c, gt_d, noise, precomputed=None,
                f8_center=None):
        R = se3.exp_rotation(pose6[3:6])
        world_d = dirs @ R.T
        world_o = jnp.broadcast_to(pose6[0:3], world_d.shape)
        outputs = render_rays(
            world_o, world_d, map_state, map_state.embeddings,
            decoder_params, settings.decoder, rnd, noise,
            occupancy=occupancy, point_store=point_store,
            pointnet_params=(decoder_params.get("pointnet")
                             if rnd.feature_mode == "pcd" else None),
            corner_feats=corner_feats, fresh_thresh=fresh_thresh,
            precomputed=precomputed, f8_center=f8_center)
        ray_w = None
        if rnd.fresh_voxel_margin > 0 or rnd.fresh_window_frames > 0:
            # discount rays dominated by freshly-allocated (half-trained)
            # voxels: their biased SDF drags the pose during pans into
            # unmapped territory
            ray_w = 1.0 - (1.0 - trk.fresh_ray_floor) * jax.lax.stop_gradient(
                outputs.fresh_frac)
        loss, aux = compute_loss(
            outputs, gt_c, gt_d, settings.loss,
            weight_depth_loss=trk.depth_variance, ray_weights=ray_w)
        hit_ratio = jnp.mean(outputs.hit_mask.astype(jnp.float32))
        return loss, hit_ratio

    # fixed-batch mode: one pixel batch per frame, intersect + stratified
    # sampling hoisted out of the pose scan (they are ~1/3 of the
    # iteration; the hit topology is loop-invariant at sub-mm pose steps)
    fixed = None
    f8c = None
    if trk.fixed_sample_batch:
        key, k_pix, k_noise = jax.random.split(key, 3)
        pix = sample_frame_pixels(k_pix, None, n_rays,
                                  method=rnd.pixel_sampler,
                                  num_pixels=depth_flat.shape[0])
        f_dirs = dirs_flat[pix]
        f_gt_c = rgb_flat[pix]
        f_gt_d = depth_flat[pix]
        f_noise = jax.random.uniform(k_noise, (n_rays, SJ))
        f_dirs, f_gt_c, f_gt_d, f_noise = shard_ray_batch(
            mesh, 0, f_dirs, f_gt_c, f_gt_d, f_noise)
        from proudslam_tpu.render.renderer import intersect_and_sample
        R0 = se3.exp_rotation(prev_pose[3:6])
        w_d = f_dirs @ R0.T
        w_o = jnp.broadcast_to(prev_pose[0:3], w_d.shape)
        fixed = intersect_and_sample(w_o, w_d, map_state, rnd, f_noise,
                                     occupancy=occupancy)
        if corner_feats is not None:
            # embeddings frozen + batch fixed: the per-sample corner
            # features AND voxel centers are loop-invariant too — only
            # the pose-dependent trilinear weights remain in the scan
            from proudslam_tpu.ops.interp import precompute_f8
            inter0, samples0 = fixed
            vidx0 = jnp.maximum(inter0.voxel_idx, 0)
            valid0 = samples0.voxel_idx >= 0
            bins0 = jnp.where(valid0, samples0.bin,
                              jnp.int32(inter0.voxel_idx.shape[1]))
            f8c = precompute_f8(corner_feats, vidx0, bins0,
                                map_state.voxel_keys, rnd.voxel_size)
        else:
            f8c = None

    def step(carry, lr):
        pose6, m, v, t, k = carry
        if trk.fixed_sample_batch:
            dirs, gt_c, gt_d, noise = f_dirs, f_gt_c, f_gt_d, f_noise
        else:
            k, k_pix, k_noise = jax.random.split(k, 3)
            pix = sample_frame_pixels(k_pix, None, n_rays,
                                      method=rnd.pixel_sampler,
                                      num_pixels=depth_flat.shape[0])
            dirs = dirs_flat[pix]
            gt_c = rgb_flat[pix]
            gt_d = depth_flat[pix]
            noise = jax.random.uniform(k_noise, (n_rays, SJ))
            dirs, gt_c, gt_d, noise = shard_ray_batch(
                mesh, 0, dirs, gt_c, gt_d, noise)

        (loss, hit_ratio), grad = jax.value_and_grad(
            loss_fn, has_aux=True)(pose6, dirs, gt_c, gt_d, noise, fixed,
                                   f8c)

        t = t + 1
        tf = t.astype(jnp.float32)
        m = B1 * m + (1 - B1) * grad
        v = B2 * v + (1 - B2) * grad * grad
        step_vec = lr * (m / (1 - B1 ** tf)) / (
            jnp.sqrt(v / (1 - B2 ** tf)) + EPS)
        pose6 = pose6 - step_vec
        return (pose6, m, v, t, k), (loss, hit_ratio)

    # exponential lr anneal (host-computed; length == num_iterations)
    import numpy as np
    N = trk.num_iterations
    expo = np.arange(N) / max(N - 1, 1)
    lrs = jnp.asarray(
        trk.learning_rate * np.power(trk.final_lr_frac, expo),
        dtype=jnp.float32)

    init = (prev_pose,
            jnp.zeros((6,)), jnp.zeros((6,)), jnp.zeros((), jnp.int32), key)
    (pose6, m, v, t, _), (losses, hits) = jax.lax.scan(
        step, init, lrs, length=trk.num_iterations)
    return TrackResult(pose=pose6, adam_m=m, adam_v=v, adam_t=t,
                       loss=losses[-1], hit_ratio=hits[-1])
