#!/usr/bin/env python
"""Ablate the per-iteration BA (map step) cost on the real chip.

The map step is ~250 ms/frame = 10 iterations x ~25 ms (time_steps.py,
round 5); this script times ONE BA iteration — render 6x1024 rays,
grads to (embeddings, decoder, poses), Adam updates — under one-knob
variations, to attribute the cost before optimizing.

Usage: python scripts/ablate_map.py [V]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import bench_settings
    from proudslam_tpu.engine.adam import adam_update, init_adam
    from proudslam_tpu.models.decoder import init_decoder
    from proudslam_tpu.ops import voxel_hash as vh
    from proudslam_tpu.render.losses import compute_loss
    from proudslam_tpu.render.renderer import render_rays

    V = int(sys.argv[1]) if len(sys.argv) > 1 else 13000
    base = bench_settings()
    W = 6              # window slots (4 + last kf + provisional)
    R = 1024           # rays per slot

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[:V, 1] = -1.5
    coords = np.unique(np.floor(pts / base.render.voxel_size).astype(np.int64),
                       axis=0)[:V]
    state = vh.build_map_state_numpy(coords, base.map)
    state = state._replace(embeddings=jnp.asarray(
        0.01 * rng.standard_normal(state.embeddings.shape), jnp.float32))
    params = init_decoder(jax.random.PRNGKey(1), base.decoder)

    key = jax.random.PRNGKey(2)
    dirs = jnp.concatenate([
        0.4 * jax.random.normal(key, (W * R, 2)), jnp.ones((W * R, 1))],
        axis=-1)
    o = jnp.zeros((W * R, 3))
    gt_c = jnp.full((W * R, 3), 0.5)
    gt_d = jnp.full((W * R,), 2.0)

    def make_iter(s, grads=(0, 1, 2), with_adam=True, fwd_only=False):
        rnd = s.render
        SJ = rnd.max_samples - rnd.max_hits
        noise = jax.random.uniform(jax.random.PRNGKey(3), (W * R, SJ))

        def loss_fn(emb, p, pose_t):
            out = render_rays(o + pose_t, dirs, state, emb, p,
                              s.decoder, rnd, noise)
            loss, _ = compute_loss(out, gt_c, gt_d, s.loss,
                                   weight_depth_loss=False)
            return loss

        if fwd_only:
            f = jax.jit(loss_fn)
            return lambda: f(state.embeddings, params, jnp.zeros((3,)))

        def iter_fn(emb, p, pose_t, eopt, dopt):
            loss, g = jax.value_and_grad(loss_fn, argnums=grads)(
                emb, p, pose_t)
            if with_adam and 0 in grads:
                emb, eopt = adam_update(emb, g[0], eopt, 5e-3)
            if with_adam and 1 in grads:
                p, dopt = adam_update(p, g[grads.index(1)], dopt, 5e-3)
            return loss, emb, p, eopt, dopt
        f = jax.jit(iter_fn)
        eopt = init_adam(state.embeddings)
        dopt = init_adam(params)
        return lambda: f(state.embeddings, params, jnp.zeros((3,)),
                         eopt, dopt)

    def rs(s, **kw):
        return dataclasses.replace(s, render=dataclasses.replace(
            s.render, **kw))

    variants = [
        ("base full iter (H12 S96 brute)", make_iter(base)),
        ("fwd only", make_iter(base, fwd_only=True)),
        ("grads, no adam", make_iter(base, with_adam=False)),
        ("pose grad only", make_iter(base, grads=(2,), with_adam=False)),
        ("emb grad only", make_iter(base, grads=(0,), with_adam=False)),
        ("emb+pose (no dec)", make_iter(base, grads=(0, 2),
                                        with_adam=False)),
        ("S=80", make_iter(rs(base, max_samples=80))),
        ("S=64", make_iter(rs(base, max_samples=64))),
        ("S=48", make_iter(rs(base, max_samples=48))),
        ("H=10", make_iter(rs(base, max_hits=10))),
        ("H=10 S=80", make_iter(rs(base, max_hits=10, max_samples=80))),
        ("dda", make_iter(rs(base, intersect_mode="dda"))),
    ]
    for name, fn in variants:
        ms = bench(fn)
        print(f"{name:>32}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
