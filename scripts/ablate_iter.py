#!/usr/bin/env python
"""Ablate the per-iteration render+grad cost on the real chip.

Times a single fused track-iteration gradient (the scan body of
`track_frame`) under one-knob-at-a-time variations of the render settings,
to attribute the ~6.5 ms/iter cost measured by `profile_phases.py`.

Usage: python scripts/ablate_iter.py [R] [V]
"""

import dataclasses
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
    from proudslam_tpu.models.decoder import init_decoder
    from proudslam_tpu.ops import voxel_hash as vh
    from proudslam_tpu.render.renderer import render_rays
    from proudslam_tpu.render.losses import compute_loss

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 13000
    base = bench_settings()

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[: V, 1] = -1.5
    coords = np.unique(np.floor(pts / base.render.voxel_size).astype(np.int64),
                       axis=0)[:V]
    state = vh.build_map_state_numpy(coords, base.map)
    state = state._replace(embeddings=jnp.asarray(
        0.01 * rng.standard_normal(state.embeddings.shape), jnp.float32))
    params = init_decoder(jax.random.PRNGKey(1), base.decoder)

    key = jax.random.PRNGKey(2)
    dirs = jnp.concatenate([
        0.4 * jax.random.normal(key, (R, 2)), jnp.ones((R, 1))], axis=-1)
    o = jnp.zeros((R, 3))
    gt_c = jnp.full((R, 3), 0.5)
    gt_d = jnp.full((R,), 2.0)

    def make_iter(s, grads=(0,)):
        rnd = s.render
        SJ = rnd.max_samples - rnd.max_hits
        noise = jax.random.uniform(jax.random.PRNGKey(3), (R, SJ))

        def track_iter(pose_t, emb, p):
            out = render_rays(o + pose_t, dirs, state, emb, p,
                              s.decoder, rnd, noise)
            loss, _ = compute_loss(out, gt_c, gt_d, s.loss,
                                   weight_depth_loss=True)
            return loss
        f = jax.jit(jax.grad(track_iter, argnums=grads))
        return lambda: f(jnp.zeros((3,)), state.embeddings, params)

    variants = {
        "base (bench config)": base,
        "fwd only": None,
        "grads emb+dec too": None,
        "S=64": dataclasses.replace(base, render=dataclasses.replace(
            base.render, max_samples=64)),
        "S=48": dataclasses.replace(base, render=dataclasses.replace(
            base.render, max_samples=48)),
        "H=10": dataclasses.replace(base, render=dataclasses.replace(
            base.render, max_hits=10)),
        "brute": dataclasses.replace(base, render=dataclasses.replace(
            base.render, intersect_mode="brute")),
        "no fused mlp": dataclasses.replace(base, decoder=dataclasses.replace(
            base.decoder, use_fused_mlp=False)),
    }

    for name, s in variants.items():
        if name == "fwd only":
            rnd = base.render
            SJ = rnd.max_samples - rnd.max_hits
            noise = jax.random.uniform(jax.random.PRNGKey(3), (R, SJ))

            def fwd(pose_t):
                out = render_rays(o + pose_t, dirs, state, state.embeddings,
                                  params, base.decoder, rnd, noise)
                loss, _ = compute_loss(out, gt_c, gt_d, base.loss,
                                       weight_depth_loss=True)
                return loss
            f = jax.jit(fwd)
            ms = bench(lambda: f(jnp.zeros((3,))))
        elif name == "grads emb+dec too":
            ms = bench(make_iter(base, grads=(0, 1, 2)))
        else:
            ms = bench(make_iter(s))
        print(f"{name:>28}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
