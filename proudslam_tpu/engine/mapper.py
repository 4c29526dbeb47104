"""Incremental mapping: bundle-adjustment-style joint optimization of
vertex embeddings, the SDF decoder, and keyframe poses.

Re-design of `bundle_adjust_frames` + `Mapping.do_mapping`
(`src/variations/render_helpers.py:559-676`, `src/mapping.py:173-218`):
one jitted `lax.scan` over ``num_iterations``. Each iteration samples
``N_rays_each`` fresh pixels from every frame in the optimization window
(a host-chosen random keyframe window plus the just-tracked frame), renders
the concatenated ray batch, and Adam-steps embeddings (lr 5e-3), decoder
(lr 5e-3), and window poses (per-row warm-started Adam — the reference
keeps stepping each frame's own optimizer, which for tracked frames is the
*tracker's* Adam at the tracker's lr, `render_helpers.py:594-600` +
`tracking.py:150`).

Window slots can be invalid (early in the run there are fewer keyframes
than ``window_size``): their ray origins are displaced far outside the map
so they miss every voxel and drop out of every loss term, and their pose
rows are masked from updates. Slot-0 (stamp 0) poses are never optimized
(reference `render_helpers.py:594-596`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from proudslam_tpu.config import SystemSettings
from proudslam_tpu.engine.adam import AdamState, adam_update, adam_update_rows, init_adam
from proudslam_tpu.engine.state import KeyframeStore, PoseAdamState
from proudslam_tpu.geometry import se3
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.ops.sampling import sample_frame_pixels
from proudslam_tpu.render.losses import compute_loss
from proudslam_tpu.render.renderer import render_rays

FAR_AWAY = 1.0e6  # ray origin displacement that guarantees zero hits


class MapOptState(NamedTuple):
    embed: AdamState
    decoder: AdamState


def init_map_opt(embeddings: jnp.ndarray, decoder_params) -> MapOptState:
    return MapOptState(embed=init_adam(embeddings),
                       decoder=init_adam(decoder_params))


class MapStepResult(NamedTuple):
    map_state: vh.MapState
    decoder_params: object
    store: KeyframeStore
    opt: MapOptState
    loss: jnp.ndarray


def map_step(map_state: vh.MapState, decoder_params,
             store: KeyframeStore, opt: MapOptState,
             rays_dir: jnp.ndarray,
             sel_idx: jnp.ndarray, sel_valid: jnp.ndarray,
             key: jax.Array, settings: SystemSettings,
             update_pose: bool = True, update_decoder: bool = True,
             mesh=None, point_store=None) -> MapStepResult:
    """One mapping round (= one reference ``do_mapping`` call).

    Args:
      rays_dir: (H, W, 3) camera-frame pixel ray directions.
      sel_idx: (W+1,) int32 distinct keyframe-store slots (random committed
        window + provisional tracked-frame slot).
      sel_valid: (W+1,) bool — live entries of sel_idx.
      update_pose/update_decoder: static; the final-refinement mode freezes
        poses and decoder (reference `mapping.py:158-163`).
      mesh: optional ("dp", "mp") mesh — per-frame ray batches shard over
        dp, the embedding table over mp (`parallel/engine.py`).
    """
    from proudslam_tpu.parallel.engine import shard_embeddings, shard_ray_batch

    mpr = settings.mapper
    rnd = settings.render
    n_rays = mpr.n_rays_each
    Wsel = sel_idx.shape[0]
    SJ = rnd.max_samples - rnd.max_hits

    H, W = store.depth.shape[1:3]
    dirs_flat = rays_dir.reshape(H * W, 3)
    sel_rgb = store.rgb[sel_idx].reshape(Wsel, H * W, 3)
    sel_depth = store.depth[sel_idx].reshape(Wsel, H * W)
    sel_stamps = store.stamps[sel_idx]

    pose_mask = sel_valid & (sel_stamps != 0)
    if not update_pose:
        pose_mask = jnp.zeros_like(pose_mask)
    origin_shift = jnp.where(sel_valid[:, None], 0.0, FAR_AWAY)

    # dda occupancy grid is frozen across the BA iterations — build once
    occupancy = None
    if rnd.intersect_mode == "dda":
        from proudslam_tpu.ops.intersect import build_occupancy
        occupancy = build_occupancy(map_state.voxel_keys,
                                    map_state.num_voxels, rnd)

    def loss_fn(embeddings, dec_params, poses, dirs, gt_c, gt_d, noise,
                precomputed=None):
        R = se3.exp_rotation(poses[:, 3:6])                   # (Wsel, 3, 3)
        world_d = jnp.einsum("fnd,fed->fne", dirs, R)         # d @ R^T
        world_o = jnp.broadcast_to(
            (poses[:, 0:3] + origin_shift)[:, None, :], world_d.shape)
        outputs = render_rays(
            world_o.reshape(-1, 3), world_d.reshape(-1, 3),
            map_state, embeddings,
            dec_params, settings.decoder, rnd, noise.reshape(-1, SJ),
            occupancy=occupancy, point_store=point_store,
            pointnet_params=(dec_params.get("pointnet")
                             if rnd.feature_mode == "pcd" else None),
            precomputed=precomputed)
        loss, _ = compute_loss(
            outputs, gt_c.reshape(-1, 3), gt_d.reshape(-1), settings.loss,
            weight_depth_loss=False)
        return loss

    def sample_batch(k):
        k_noise, k_pix = jax.random.split(k)
        pix = jax.vmap(
            lambda kk: sample_frame_pixels(kk, None, n_rays,
                                           method=rnd.pixel_sampler,
                                           num_pixels=H * W)
        )(jax.random.split(k_pix, Wsel))                      # (Wsel, N)
        dirs = dirs_flat[pix]                                 # (Wsel, N, 3)
        gt_c = jnp.take_along_axis(sel_rgb, pix[..., None], axis=1)
        gt_d = jnp.take_along_axis(sel_depth, pix, axis=1)
        noise = jax.random.uniform(k_noise, (Wsel, n_rays, SJ))
        return shard_ray_batch(mesh, 1, dirs, gt_c, gt_d, noise)

    # fixed-batch mode: ONE pixel batch for the whole BA round, with
    # intersect + stratified sampling hoisted out of the 10-iteration
    # scan (~1/3 of the iteration cost; hit topology is loop-invariant
    # at the sub-mm per-iteration pose updates — BENCH_NOTES r5)
    fixed = None
    if mpr.fixed_sample_batch:
        from proudslam_tpu.render.renderer import intersect_and_sample
        key, k_batch = jax.random.split(key)
        f_dirs, f_gt_c, f_gt_d, f_noise = sample_batch(k_batch)
        poses0 = store.poses[sel_idx]
        R0 = se3.exp_rotation(poses0[:, 3:6])
        w_d = jnp.einsum("fnd,fed->fne", f_dirs, R0)
        w_o = jnp.broadcast_to(
            (poses0[:, 0:3] + origin_shift)[:, None, :], w_d.shape)
        fixed = intersect_and_sample(
            w_o.reshape(-1, 3), w_d.reshape(-1, 3), map_state, rnd,
            f_noise.reshape(-1, SJ), occupancy=occupancy)

    def step(carry, _):
        (embeddings, dec_params, poses, pm, pv, pt,
         embed_opt, dec_opt, k) = carry
        if mpr.fixed_sample_batch:
            dirs, gt_c, gt_d, noise = f_dirs, f_gt_c, f_gt_d, f_noise
        else:
            k, k_batch = jax.random.split(k)
            dirs, gt_c, gt_d, noise = sample_batch(k_batch)

        loss, (g_emb, g_dec, g_pose) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2))(
                embeddings, dec_params, poses, dirs, gt_c, gt_d, noise,
                fixed)

        embeddings, embed_opt = adam_update(
            embeddings, g_emb, embed_opt, mpr.embed_lr)
        if update_decoder:
            dec_params, dec_opt = adam_update(
                dec_params, g_dec, dec_opt, mpr.decoder_lr)
        poses, pm, pv, pt = adam_update_rows(
            poses, g_pose, pm, pv, pt, settings.tracker.learning_rate,
            pose_mask)
        return (embeddings, dec_params, poses, pm, pv, pt,
                embed_opt, dec_opt, k), loss

    init = (shard_embeddings(mesh, map_state.embeddings), decoder_params,
            store.poses[sel_idx],
            store.pose_adam.m[sel_idx], store.pose_adam.v[sel_idx],
            store.pose_adam.t[sel_idx],
            opt.embed, opt.decoder, key)
    (embeddings, decoder_params, poses, pm, pv, pt,
     embed_opt, dec_opt, _), losses = jax.lax.scan(
        step, init, None, length=mpr.num_iterations)

    # scatter refined poses + moments back (invalid rows dropped)
    K = store.stamps.shape[0]
    scatter_idx = jnp.where(sel_valid, sel_idx, K)
    store = store._replace(
        poses=store.poses.at[scatter_idx].set(poses, mode="drop"),
        pose_adam=PoseAdamState(
            m=store.pose_adam.m.at[scatter_idx].set(pm, mode="drop"),
            v=store.pose_adam.v.at[scatter_idx].set(pv, mode="drop"),
            t=store.pose_adam.t.at[scatter_idx].set(pt, mode="drop"),
        ))
    return MapStepResult(
        map_state=map_state._replace(embeddings=embeddings),
        decoder_params=decoder_params,
        store=store,
        opt=MapOptState(embed=embed_opt, decoder=dec_opt),
        loss=losses[-1])
