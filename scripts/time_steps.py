#!/usr/bin/env python
"""Accurate device-time measurement of the four SLAM step executables.

Through the remote-TPU tunnel, ``block_until_ready`` is a no-op until the
first device->host transfer (after which every fence costs ~25 ms), so
naive fenced timing either lies or measures the degraded mode. This
script times N *chained* dispatches per step (each consuming the previous
call's output, so device execution serializes) and closes each batch with
ONE tiny D2H fetch — wall time / N then approximates true device time
with a single round-trip amortized away.

Usage: python scripts/time_steps.py [N] [V]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    from bench import bench_settings
    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.ops import voxel_hash as vh

    import dataclasses
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 13000
    settings = bench_settings()
    # optional overrides: [3] intersect mode, [4] fused_mlp 0/1
    if len(sys.argv) > 3:
        settings = dataclasses.replace(settings, render=dataclasses.replace(
            settings.render, intersect_mode=sys.argv[3]))
    if len(sys.argv) > 4:
        settings = dataclasses.replace(settings, decoder=dataclasses.replace(
            settings.decoder, use_fused_mlp=bool(int(sys.argv[4]))))
    H, W = 240, 320
    slam = SlamSystem(settings, (0.9 * W, 0.9 * W, (W - 1) / 2, (H - 1) / 2),
                      (H, W), seed=0, point_stride=2)

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[:V, 1] = -1.5
    coords = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)[:V]
    ms0 = vh.build_map_state_numpy(coords, settings.map)
    slam.map_state = ms0._replace(embeddings=slam.map_state.embeddings)

    rgb_d = jnp.full((H, W, 3), 0.5)
    depth_d = jnp.full((H, W), 2.0)
    p6 = jnp.zeros((6,))

    def timed(tag, dispatch, probe, n=N, warm=2):
        """dispatch() -> object; probe(obj) -> tiny device array fetched
        once at the end."""
        out = None
        for _ in range(warm):
            out = dispatch()
        np.asarray(probe(out))          # drain queue + the warmup calls
        t0 = time.perf_counter()
        for _ in range(n):
            out = dispatch()
        np.asarray(probe(out))
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"{tag:>28}: {dt:8.2f} ms")
        return dt

    r = {}
    r["track(30it)"] = timed(
        "track_frame (30 iters)",
        lambda: slam._track(slam.map_state, slam.decoder_params, p6,
                            slam.rays_dir, rgb_d, depth_d, slam._next_key(),
                            slam.point_store),
        lambda o: o.pose)

    sel = jnp.arange(6, dtype=jnp.int32)
    valid = jnp.ones((6,), bool)
    state = {"store": slam.store, "dec": slam.decoder_params,
             "opt": slam.opt}

    def map_dispatch():
        res = slam._map(slam.map_state, state["dec"], state["store"],
                        state["opt"], slam.rays_dir, sel, valid,
                        slam._next_key(), slam.point_store)
        state["store"], state["dec"], state["opt"] = \
            res.store, res.decoder_params, res.opt
        return res
    r["map(10it,6f)"] = timed("map_step (10 iters, 6 slots)",
                              map_dispatch, lambda o: o.loss)

    mstate = {"ms": slam.map_state}

    def ins_dispatch():
        mstate["ms"], _, _, _ = slam._insert_jit(
            mstate["ms"], slam.point_store, rgb_d, depth_d, p6,
            slam.rays_dir)
        return mstate["ms"]
    r["insert"] = timed("insert", ins_dispatch, lambda o: o.num_voxels)

    wstate = {"s": state["store"]}

    def wr_dispatch():
        wstate["s"] = slam._write(
            wstate["s"], jnp.int32(1), rgb_d, depth_d, jnp.int32(1),
            p6, p6, p6, jnp.zeros((), jnp.int32))
        return wstate["s"]
    r["write"] = timed("write", wr_dispatch, lambda o: o.stamps)

    total = sum(r.values())
    print(f"{'sum':>28}: {total:8.2f} ms -> {1000.0 / total:.2f} fps bound")


if __name__ == "__main__":
    main()
