#!/usr/bin/env python
"""Component-level microbenchmarks of the render hot path on the real chip.

Times each stage standalone at tracking shapes (R rays x S samples against
a bench-scale map): DDA intersect, brute intersect, segment sampler,
feature gather, MLP fwd, MLP fwd+bwd, full render fwd, full
track-iteration (render + loss + grad), and the full 30-iter track_frame /
10-iter map_step. This is how the per-frame 0.64 s budget gets attributed
— the phase profiler (profile_phases.py) fences whole steps; this fences
their ingredients.

Usage: python scripts/micro_profile.py [R] [V]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    import threading
    th = threading.Thread(
        target=lambda: np.asarray(jnp.ones((8,))), daemon=True)
    th.start()

    from bench import bench_settings
    from proudslam_tpu.models.decoder import init_decoder
    from proudslam_tpu.ops import voxel_hash as vh
    from proudslam_tpu.ops.intersect import (
        build_occupancy, ray_intersect, ray_intersect_dda)
    from proudslam_tpu.ops.sampling import sample_rays_in_segments
    from proudslam_tpu.ops.interp import gather_ray_features
    from proudslam_tpu.ops.pallas.mlp_kernel import decoder_values_fused
    from proudslam_tpu.render.renderer import render_rays
    from proudslam_tpu.render.losses import compute_loss

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 13000
    s = bench_settings()
    rnd = s.render
    H, S = rnd.max_hits, rnd.max_samples
    SJ = S - H
    D = s.map.embed_dim

    # bench-scale map: a plausible voxel shell (sphere surface + floor)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[: V, 1] = -1.5  # floor band
    coords = np.unique(np.floor(pts / rnd.voxel_size).astype(np.int64),
                       axis=0)[:V]
    state = vh.build_map_state_numpy(coords, s.map)
    state = state._replace(embeddings=jnp.asarray(
        0.01 * rng.standard_normal(state.embeddings.shape), jnp.float32))
    params = init_decoder(jax.random.PRNGKey(1), s.decoder)
    nv = int(state.num_voxels)
    print(f"map: {nv} voxels; R={R} H={H} S={S}", file=sys.stderr)

    key = jax.random.PRNGKey(2)
    dirs = jnp.concatenate([
        0.4 * jax.random.normal(key, (R, 2)), jnp.ones((R, 1))], axis=-1)
    o = jnp.zeros((R, 3))
    noise = jax.random.uniform(jax.random.PRNGKey(3), (R, SJ))
    th.join()

    res = {}

    occ = jax.jit(lambda k, n: build_occupancy(k, n, rnd))(
        state.voxel_keys, state.num_voxels)
    res["build_occupancy"] = bench(
        jax.jit(lambda k, n: build_occupancy(k, n, rnd)),
        state.voxel_keys, state.num_voxels)

    dda = jax.jit(lambda o, d, k, n: ray_intersect_dda(o, d, k, n, rnd))
    res["intersect_dda"] = bench(dda, o, dirs, state.voxel_keys,
                                 state.num_voxels)

    centers = jax.jit(lambda st: vh.voxel_centers(st, s.map))(state)
    valid = jnp.arange(state.voxel_keys.shape[0]) < state.num_voxels
    brute = jax.jit(lambda o, d, c, v: ray_intersect(o, d, c, v, rnd))
    res["intersect_brute"] = bench(brute, o, dirs, centers, valid)

    inter = dda(o, dirs, state.voxel_keys, state.num_voxels)
    sampler = jax.jit(lambda it, nz: sample_rays_in_segments(it, rnd, nz))
    res["sampler"] = bench(sampler, inter, noise)

    samples = sampler(inter, noise)
    z = samples.depth
    xyz = o[:, None, :] + dirs[:, None, :] * z[..., None]
    sbins = jnp.where(samples.voxel_idx >= 0, samples.bin, H)
    gather = jax.jit(lambda xyz, b, hi, st, emb: gather_ray_features(
        xyz, b, hi, st.voxel_keys, st.voxel_vertex_ids, emb, rnd.voxel_size,
        inv_map=st.inv_map))
    res["gather"] = bench(gather, xyz, sbins, inter.voxel_idx, state,
                          state.embeddings)

    def gather_loss(emb, xyz):
        out = gather_ray_features(
            xyz, sbins, inter.voxel_idx, state.voxel_keys,
            state.voxel_vertex_ids, emb, rnd.voxel_size,
            inv_map=state.inv_map)
        return jnp.sum(out * out)
    res["gather_fwd_bwd"] = bench(
        jax.jit(jax.grad(gather_loss, argnums=(0, 1))), state.embeddings, xyz)

    feats = gather(xyz, samples.bin, inter.voxel_idx, state,
                   state.embeddings).reshape(R * S, D)
    mlp_f = jax.jit(lambda p, x: decoder_values_fused(p, s.decoder, x))
    res["mlp_fwd"] = bench(mlp_f, params, feats)

    def mlp_loss(p, x):
        out = decoder_values_fused(p, s.decoder, x)
        return jnp.sum(out * out)
    mlp_fb = jax.jit(jax.grad(mlp_loss, argnums=(0, 1)))
    res["mlp_fwd_bwd"] = bench(mlp_fb, params, feats)

    rr = jax.jit(lambda o, d, st, emb, p, nz: render_rays(
        o, d, st, emb, p, s.decoder, rnd, nz))
    res["render_fwd"] = bench(rr, o, dirs, state, state.embeddings, params,
                              noise)

    gt_c = jnp.full((R, 3), 0.5)
    gt_d = jnp.full((R,), 2.0)

    def track_iter(pose_t, emb, p, nz):
        out = render_rays(o + pose_t, dirs, state, emb, p, s.decoder, rnd, nz)
        loss, _ = compute_loss(out, gt_c, gt_d, s.loss,
                               weight_depth_loss=True)
        return loss
    ti = jax.jit(jax.grad(track_iter, argnums=(0,)))
    res["track_iter_grad"] = bench(ti, jnp.zeros((3,)), state.embeddings,
                                   params, noise)

    def map_iter(emb, p, nz):
        out = render_rays(o, dirs, state, emb, p, s.decoder, rnd, nz)
        loss, _ = compute_loss(out, gt_c, gt_d, s.loss)
        return loss
    mi = jax.jit(jax.grad(map_iter, argnums=(0, 1)))
    res["map_iter_grad(1k rays)"] = bench(mi, state.embeddings, params,
                                          noise)

    for k, v in res.items():
        print(f"{k:>24}: {v:8.2f} ms")
    t = res["track_iter_grad"] * 30 + res["map_iter_grad(1k rays)"] * 5 * 10
    print(f"  -> naive per-frame estimate (30 track + 50 map-ray-batches): "
          f"{t:.0f} ms = {1000 / t:.2f} fps upper structure")


if __name__ == "__main__":
    main()
