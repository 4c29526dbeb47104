#!/usr/bin/env python
"""Phase-level timing of ONE BA iteration at production shapes:
intersect / sample / gather+decode fwd / full fwd / fwd+bwd.

Usage: python scripts/probe_phases2.py [R] [V] [S] [H]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, n=30, warmup=3):
    import jax
    import numpy as np
    out = None
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import bench_settings
    from proudslam_tpu.models.decoder import init_decoder
    from proudslam_tpu.ops import voxel_hash as vh
    from proudslam_tpu.ops.intersect import ray_intersect
    from proudslam_tpu.ops.sampling import sample_rays_in_segments
    from proudslam_tpu.render.losses import compute_loss
    from proudslam_tpu.render.renderer import render_rays
    from proudslam_tpu.ops.voxel_hash import unpack_key

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 13000
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    Hh = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    base = bench_settings()
    s = dataclasses.replace(base, render=dataclasses.replace(
        base.render, max_samples=S, max_hits=Hh))
    rnd = s.render

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[:V, 1] = -1.5
    coords = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)[:V]
    state = vh.build_map_state_numpy(coords, s.map)
    state = state._replace(embeddings=jnp.asarray(
        0.01 * rng.standard_normal(state.embeddings.shape), jnp.float32))
    params = init_decoder(jax.random.PRNGKey(1), s.decoder)

    key = jax.random.PRNGKey(2)
    dirs = jnp.concatenate([
        0.4 * jax.random.normal(key, (R, 2)), jnp.ones((R, 1))], axis=-1)
    o = jnp.zeros((R, 3))
    gt_c = jnp.full((R, 3), 0.5)
    gt_d = jnp.full((R,), 2.0)
    SJ = rnd.max_samples - rnd.max_hits
    noise = jax.random.uniform(jax.random.PRNGKey(3), (R, SJ))

    Vb = state.voxel_keys.shape[0]
    centers = (unpack_key(state.voxel_keys).astype(jnp.float32)
               + 0.5) * rnd.voxel_size
    voxel_valid = jnp.arange(Vb, dtype=jnp.int32) < state.num_voxels

    inter_f = jax.jit(lambda d: ray_intersect(o, d, centers, voxel_valid,
                                              rnd))
    print(f"{'intersect only':>28}: {bench(lambda: inter_f(dirs)):7.2f} ms",
          flush=True)

    inter0 = inter_f(dirs)
    samp_f = jax.jit(lambda i, n: sample_rays_in_segments(i, rnd, n))
    print(f"{'sample only':>28}: "
          f"{bench(lambda: samp_f(inter0, noise)):7.2f} ms", flush=True)

    def fwd(emb, p, pose_t):
        out = render_rays(o + pose_t, dirs, state, emb, p, s.decoder, rnd,
                          noise)
        loss, _ = compute_loss(out, gt_c, gt_d, s.loss,
                               weight_depth_loss=False)
        return loss
    fwd_j = jax.jit(fwd)
    print(f"{'full fwd+loss':>28}: "
          f"{bench(lambda: fwd_j(state.embeddings, params, jnp.zeros(3))):7.2f}"
          " ms", flush=True)

    g_j = jax.jit(jax.value_and_grad(fwd, argnums=(0, 1, 2)))
    print(f"{'fwd+bwd (emb,dec,pose)':>28}: "
          f"{bench(lambda: g_j(state.embeddings, params, jnp.zeros(3))):7.2f}"
          " ms", flush=True)

    g1_j = jax.jit(jax.value_and_grad(fwd, argnums=(0,)))
    print(f"{'fwd+bwd (emb only)':>28}: "
          f"{bench(lambda: g1_j(state.embeddings, params, jnp.zeros(3))):7.2f}"
          " ms", flush=True)


if __name__ == "__main__":
    main()
