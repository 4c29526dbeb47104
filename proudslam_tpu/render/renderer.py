"""Differentiable SDF volume renderer (pure-jnp reference path).

Re-design of `render_rays` (`src/variations/render_helpers.py:351-556`) with
static shapes and masks instead of boolean compaction: every ray keeps its
lane; rays that miss the map are masked out of the loss via ``hit_mask``.
This file is the *correctness oracle*; the fused Pallas kernels in
`ops/pallas/` are benchmarked and tested against it.

Pipeline per ray batch:
  intersect (sorted voxel hits) -> stratified segment samples ->
  trilinear feature gather -> MLP decode -> sdf2weights -> integrate.

Gradient flow matches the reference exactly: sample depths/indices are
non-differentiable (`voxel_helpers.py:364-366`), pose gradients flow only
through ``sampled_xyz = o + d * stop_grad(z)``
(`render_helpers.py:436-441`), and map gradients through the trilinear
gather + MLP.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from proudslam_tpu.config import DecoderSettings, RenderSettings
from proudslam_tpu.models.decoder import decoder_values
from proudslam_tpu.ops.intersect import ray_intersect, ray_intersect_dda
from proudslam_tpu.ops.interp import gather_ray_features, gather_voxel_features
from proudslam_tpu.ops.sampling import RaySamples, sample_rays_in_segments


class RenderOutputs(NamedTuple):
    color: jnp.ndarray      # (R, 3)
    depth: jnp.ndarray      # (R,)
    sdf: jnp.ndarray        # (R, S) — 1.0 at invalid samples
    z_vals: jnp.ndarray     # (R, S) — sentinel at invalid samples
    weights: jnp.ndarray    # (R, S)
    sample_mask: jnp.ndarray  # (R, S) bool
    hit_mask: jnp.ndarray   # (R,) bool
    z_min: jnp.ndarray      # (R,) first zero-crossing depth
    fresh_frac: jnp.ndarray = None  # (R,) fraction of hit slots in freshly
    #   allocated voxels (see RenderSettings.fresh_voxel_margin; all-zero
    #   when the margin is 0)


def sdf_to_weights(sdf: jnp.ndarray, z_vals: jnp.ndarray,
                   valid: jnp.ndarray, truncation: float):
    """Bell-shaped SDF weights with first-surface truncation masking.

    Mirrors `sdf2weights` (`render_helpers.py:521-539`): weight =
    sigmoid(sdf/T)*sigmoid(-sdf/T), masked to z < z_first_crossing + T and
    to valid samples, then normalized per ray.
    """
    w = jax.nn.sigmoid(sdf / truncation) * jax.nn.sigmoid(-sdf / truncation)
    signs = sdf[:, 1:] * sdf[:, :-1]
    crossing = (signs < 0.0).astype(jnp.float32)
    inds = jnp.argmax(crossing, axis=1)             # first crossing (0 if none)
    z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)
    trunc_mask = (z_vals < z_min + truncation).astype(jnp.float32)
    w = w * trunc_mask * valid.astype(jnp.float32)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)
    return w, z_min[:, 0]


def _fresh_fraction(hit_voxel_idx, num_voxels, settings, fresh_thresh):
    """Per-ray fraction of hit slots in freshly-allocated voxels.

    ``fresh_thresh`` (traced scalar: the live voxel count N frames ago,
    see RenderSettings.fresh_window_frames) takes precedence; else the
    static ``fresh_voxel_margin`` below the current count; else zeros.
    """
    hit_valid = hit_voxel_idx >= 0
    if fresh_thresh is not None:
        thresh = fresh_thresh
    elif settings.fresh_voxel_margin > 0:
        thresh = num_voxels - settings.fresh_voxel_margin
    else:
        return jnp.zeros(hit_voxel_idx.shape[:1], jnp.float32)
    fresh = hit_valid & (hit_voxel_idx >= thresh)
    return (jnp.sum(fresh, axis=-1).astype(jnp.float32)
            / jnp.maximum(jnp.sum(hit_valid, axis=-1), 1))


def intersect_and_sample(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                         map_state, settings: RenderSettings,
                         noise: jnp.ndarray, occupancy: jnp.ndarray = None):
    """Intersect + stratified-sample a ray batch (the first two render
    stages) — for callers that freeze the ray batch across an optimizer
    scan and pass the result to ``render_rays(precomputed=...)``."""
    from proudslam_tpu.ops.voxel_hash import unpack_key

    if settings.intersect_mode == "dda":
        inter = ray_intersect_dda(rays_o, rays_d, map_state.voxel_keys,
                                  map_state.num_voxels, settings,
                                  occupancy=occupancy)
    else:
        V = map_state.voxel_keys.shape[0]
        centers = (unpack_key(map_state.voxel_keys).astype(jnp.float32)
                   + 0.5) * settings.voxel_size
        voxel_valid = jnp.arange(V, dtype=jnp.int32) < map_state.num_voxels
        inter = ray_intersect(rays_o, rays_d, centers, voxel_valid, settings)
    return inter, sample_rays_in_segments(inter, settings, noise)


def render_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                map_state, embeddings: jnp.ndarray,
                decoder_params, decoder_settings: DecoderSettings,
                settings: RenderSettings, noise: jnp.ndarray,
                occupancy: jnp.ndarray = None,
                point_store=None, pointnet_params=None,
                corner_feats: jnp.ndarray = None,
                fresh_thresh: jnp.ndarray = None,
                precomputed=None, f8_center=None,
                ) -> RenderOutputs:
    """Render a batch of rays against the current map.

    Args:
      rays_o, rays_d: (R, 3) world rays; directions unnormalized so depth
        integrates camera-plane z (reference convention).
      map_state: ops.voxel_hash.MapState (geometry + vertex topology).
      embeddings: (E, D) vertex embedding table — passed separately so the
        mapper can differentiate w.r.t. it (usually map_state.embeddings).
      noise: (R, max_samples - max_hits) stratification uniforms.
      occupancy: optional precomputed dense occupancy grid
        (`ops.intersect.build_occupancy`) for the "dda" mode. The grid is
        loop-invariant across the tracker/mapper Adam iterations but XLA
        does not hoist its O(grid) scatter out of the `lax.scan` — callers
        that iterate build it once and pass it in. Ditto corner_feats: a
        precomputed `ops.interp.corner_view` (V,8D), loop-invariant when
        embeddings are frozen (tracking) — saves its ~1.9 ms gather per
        iteration (~1.5 ms/iteration for the occupancy grid saved
        at bench scale).
    """
    from proudslam_tpu.ops.voxel_hash import unpack_key

    if precomputed is not None:
        # (inter, samples) computed ONCE per optimization round and
        # reused across the Adam iterations: per-iteration pose updates
        # are sub-mm against 0.2 m voxels, so the hit topology and sample
        # depths are effectively loop-invariant, while the intersect +
        # sample stages are ~1/3 of the iteration cost (probe_phases2,
        # BENCH_NOTES r5). Sample positions still move with the CURRENT
        # pose below (xyz = o + d·z, z stop-grad) — exactly the gradient
        # path the reference uses (`render_helpers.py:436-441`).
        inter, samples = precomputed
    elif settings.intersect_mode == "dda":
        inter = ray_intersect_dda(rays_o, rays_d, map_state.voxel_keys,
                                  map_state.num_voxels, settings,
                                  occupancy=occupancy)
        samples = sample_rays_in_segments(inter, settings, noise)
    else:
        V = map_state.voxel_keys.shape[0]
        centers = (unpack_key(map_state.voxel_keys).astype(jnp.float32)
                   + 0.5) * settings.voxel_size
        voxel_valid = jnp.arange(V, dtype=jnp.int32) < map_state.num_voxels
        inter = ray_intersect(rays_o, rays_d, centers, voxel_valid, settings)
        samples = sample_rays_in_segments(inter, settings, noise)

    # depths / indices are non-differentiable w.r.t. pose (reference
    # marks them non-diff, voxel_helpers.py:364-366)
    z_vals = jax.lax.stop_gradient(samples.depth)          # (R, S)
    idx = jax.lax.stop_gradient(samples.voxel_idx)
    bins = jax.lax.stop_gradient(samples.bin)
    valid = idx >= 0

    sampled_xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    R, S = z_vals.shape
    from proudslam_tpu.ops.pallas.render_kernel import (
        fused_feats_decode, fused_render_applicable)
    if (settings.feature_mode != "pcd"
            and fused_render_applicable(decoder_settings)):
        # fully fused sample-feature + decoder forward (Pallas): no
        # (R,S,128) HBM intermediates; custom VJP routes gradients to the
        # corner view / pose exactly like the XLA path
        from proudslam_tpu.ops.interp import corner_view
        vidx = jnp.maximum(inter.voxel_idx, 0)
        EV = corner_feats
        if EV is None:
            EV = corner_view(embeddings, map_state.voxel_vertex_ids,
                             getattr(map_state, "inv_map", None))
        keys_rb = map_state.voxel_keys[vidx]
        S_bins = jnp.where(valid, bins, jnp.int32(inter.voxel_idx.shape[1]))
        out = fused_feats_decode(
            EV, keys_rb, vidx, S_bins, z_vals, rays_o, rays_d,
            decoder_params, settings, decoder_settings)
        color = out[:, :3].reshape(R, S, 3)
        sdf = out[:, 3].reshape(R, S)
        sdf = jnp.where(valid, sdf, 1.0)
        color = jnp.where(valid[..., None], color, 0.0)
        weights, z_min = sdf_to_weights(sdf, z_vals, valid,
                                        settings.truncation)
        rgb = jnp.sum(weights[..., None] * color, axis=-2)
        depth = jnp.sum(weights * jnp.where(valid, z_vals, 0.0), axis=-1)
        fresh_frac = _fresh_fraction(inter.voxel_idx, map_state.num_voxels,
                                     settings, fresh_thresh)
        return RenderOutputs(
            color=rgb, depth=depth, sdf=sdf, z_vals=z_vals,
            weights=weights, sample_mask=valid, hit_mask=inter.hit_mask,
            z_min=z_min, fresh_frac=fresh_frac)
    if settings.feature_mode == "pcd":
        from proudslam_tpu.render.pcd_features import gather_pcd_features
        assert point_store is not None and pointnet_params is not None, \
            "feature_mode='pcd' needs a VoxelPointStore + pointnet params"
        feats = gather_pcd_features(
            sampled_xyz, bins, inter.voxel_idx, point_store,
            pointnet_params, settings.voxel_size).reshape(R * S, -1)
    else:
        # invalid lanes -> bin H: keeps bins sorted for the segment-sum
        # backward and routes their (zero) cotangents past every slot
        S_bins = jnp.where(valid, bins, jnp.int32(inter.voxel_idx.shape[1]))
        feats = gather_ray_features(
            sampled_xyz, S_bins, inter.voxel_idx,
            map_state.voxel_keys, map_state.voxel_vertex_ids, embeddings,
            settings.voxel_size,
            inv_map=getattr(map_state, "inv_map", None),
            EV=corner_feats, f8_center=f8_center).reshape(R * S, -1)

    from proudslam_tpu.ops.pallas.mlp_kernel import (
        decoder_values_fused, fused_applicable)
    if fused_applicable(decoder_settings):
        out = decoder_values_fused(decoder_params, decoder_settings, feats)
    else:
        out = decoder_values(decoder_params, decoder_settings, feats)
    color = out[:, :3].reshape(R, S, 3)
    sdf = out[:, 3].reshape(R, S)

    # invalid lanes: sdf -> 1 (free space), color -> 0
    # (reference masked_scatter_ones / masked_scatter,
    # render_helpers.py:510-511)
    sdf = jnp.where(valid, sdf, 1.0)
    color = jnp.where(valid[..., None], color, 0.0)

    weights, z_min = sdf_to_weights(sdf, z_vals, valid, settings.truncation)
    rgb = jnp.sum(weights[..., None] * color, axis=-2)
    depth = jnp.sum(weights * jnp.where(valid, z_vals, 0.0), axis=-1)

    # voxel slots are allocated in insertion order, so slot index is a free
    # age signal: recently-allocated slots hold half-trained SDF. The
    # tracker down-weights rays dominated by such voxels (pose bias from
    # unconverged geometry is the main drift source during pans into
    # unmapped territory — BENCH_NOTES r4).
    fresh_frac = _fresh_fraction(inter.voxel_idx, map_state.num_voxels,
                                 settings, fresh_thresh)

    return RenderOutputs(
        color=rgb, depth=depth, sdf=sdf, z_vals=z_vals, weights=weights,
        sample_mask=valid, hit_mask=inter.hit_mask, z_min=z_min,
        fresh_frac=fresh_frac)
