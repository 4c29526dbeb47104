#!/usr/bin/env python
"""Cumulative-prefix timing of the render forward pipeline (one jit each).

Unlike micro_profile's standalone stages, each row here jits the pipeline
*up to* that stage, so XLA fusion between stages is accounted for — the
row-to-row delta is the marginal cost of the stage at its place in the
full program.

Usage: python scripts/ablate_fwd.py [R] [V] [mode]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=30, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import bench_settings
    from proudslam_tpu.models.decoder import decoder_values, init_decoder
    from proudslam_tpu.ops import voxel_hash as vh
    from proudslam_tpu.ops.interp import gather_ray_features
    from proudslam_tpu.ops.intersect import ray_intersect, ray_intersect_dda
    from proudslam_tpu.ops.sampling import sample_rays_in_segments
    from proudslam_tpu.render.renderer import sdf_to_weights

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 13000
    mode = sys.argv[3] if len(sys.argv) > 3 else "dda"
    s = bench_settings()
    rnd = s.render
    SJ = rnd.max_samples - rnd.max_hits

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[: V, 1] = -1.5
    coords = np.unique(np.floor(pts / rnd.voxel_size).astype(np.int64),
                       axis=0)[:V]
    state = vh.build_map_state_numpy(coords, s.map)
    state = state._replace(embeddings=jnp.asarray(
        0.01 * rng.standard_normal(state.embeddings.shape), jnp.float32))
    params = init_decoder(jax.random.PRNGKey(1), s.decoder)

    key = jax.random.PRNGKey(2)
    dirs = jnp.concatenate([
        0.4 * jax.random.normal(key, (R, 2)), jnp.ones((R, 1))], axis=-1)
    o = jnp.zeros((R, 3))
    noise = jax.random.uniform(jax.random.PRNGKey(3), (R, SJ))

    from proudslam_tpu.ops.voxel_hash import unpack_key

    def intersect(pose_t):
        ro = o + pose_t
        if mode == "dda":
            return ray_intersect_dda(ro, dirs, state.voxel_keys,
                                     state.num_voxels, rnd)
        V_ = state.voxel_keys.shape[0]
        centers = (unpack_key(state.voxel_keys).astype(jnp.float32)
                   + 0.5) * rnd.voxel_size
        valid = jnp.arange(V_, dtype=jnp.int32) < state.num_voxels
        return ray_intersect(ro, dirs, centers, valid, rnd)

    def upto_intersect(pose_t):
        it = intersect(pose_t)
        return it.voxel_idx.sum(), it.t_near.sum()

    def upto_sample(pose_t):
        it = intersect(pose_t)
        sm = sample_rays_in_segments(it, rnd, noise)
        return sm.depth.sum(), sm.voxel_idx.sum()

    def upto_gather(pose_t):
        it = intersect(pose_t)
        sm = sample_rays_in_segments(it, rnd, noise)
        z = jax.lax.stop_gradient(sm.depth)
        xyz = (o + pose_t)[:, None, :] + dirs[:, None, :] * z[..., None]
        feats = gather_ray_features(
            xyz, jax.lax.stop_gradient(sm.bin), it.voxel_idx,
            state.voxel_keys, state.voxel_vertex_ids, state.embeddings,
            rnd.voxel_size)
        return feats.sum()

    def upto_mlp(pose_t):
        it = intersect(pose_t)
        sm = sample_rays_in_segments(it, rnd, noise)
        z = jax.lax.stop_gradient(sm.depth)
        xyz = (o + pose_t)[:, None, :] + dirs[:, None, :] * z[..., None]
        feats = gather_ray_features(
            xyz, jax.lax.stop_gradient(sm.bin), it.voxel_idx,
            state.voxel_keys, state.voxel_vertex_ids, state.embeddings,
            rnd.voxel_size)
        S = rnd.max_samples
        out = decoder_values(params, s.decoder, feats.reshape(R * S, -1))
        return out.sum()

    def upto_weights(pose_t):
        it = intersect(pose_t)
        sm = sample_rays_in_segments(it, rnd, noise)
        z = jax.lax.stop_gradient(sm.depth)
        idx = jax.lax.stop_gradient(sm.voxel_idx)
        xyz = (o + pose_t)[:, None, :] + dirs[:, None, :] * z[..., None]
        feats = gather_ray_features(
            xyz, jax.lax.stop_gradient(sm.bin), it.voxel_idx,
            state.voxel_keys, state.voxel_vertex_ids, state.embeddings,
            rnd.voxel_size)
        S = rnd.max_samples
        out = decoder_values(params, s.decoder, feats.reshape(R * S, -1))
        sdf = jnp.where(idx >= 0, out[:, 3].reshape(R, S), 1.0)
        w, zmin = sdf_to_weights(sdf, z, idx >= 0, rnd.truncation)
        return w.sum(), zmin.sum()

    stages = [("intersect", upto_intersect), ("+sampler", upto_sample),
              ("+gather", upto_gather), ("+mlp", upto_mlp),
              ("+weights", upto_weights)]
    prev = 0.0
    for name, fn in stages:
        f = jax.jit(fn)
        ms = bench(lambda f=f: f(jnp.zeros((3,))))
        print(f"{name:>12}: {ms:7.2f} ms  (delta {ms - prev:+6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
