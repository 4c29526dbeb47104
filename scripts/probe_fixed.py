#!/usr/bin/env python
"""Step timings with the round-5 fast path: fixed per-round ray batches
(intersect+sample hoisted) + merged-scatter insert, at S=64.

Usage: python scripts/probe_fixed.py [N] [V]
"""

import dataclasses
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

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 13000

    base = bench_settings()
    s = dataclasses.replace(
        base,
        render=dataclasses.replace(base.render, max_samples=64),
        tracker=dataclasses.replace(base.tracker, fixed_sample_batch=True),
        mapper=dataclasses.replace(base.mapper, fixed_sample_batch=True))
    if len(sys.argv) > 3 and int(sys.argv[3]):
        # fused Pallas render path (sys.argv[3] = 1)
        s = dataclasses.replace(s, decoder=dataclasses.replace(
            s.decoder, use_fused_mlp=True))

    H, W = 240, 320
    slam = SlamSystem(s, (0.9 * W, 0.9 * W, (W - 1) / 2, (H - 1) / 2),
                      (H, W), seed=0, point_stride=2)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[:V, 1] = -1.5
    coords = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)[:V]
    ms0 = vh.build_map_state_numpy(coords, s.map)
    slam.map_state = ms0._replace(embeddings=slam.map_state.embeddings)

    rgb_d = jnp.full((H, W, 3), 0.5)
    depth_d = jnp.full((H, W), 2.0)
    p6 = jnp.zeros((6,))
    zero = jnp.int32(0)
    jax.block_until_ready((rgb_d, zero))

    def timed(tag, dispatch, probe, n=N, warm=2):
        out = None
        for _ in range(warm):
            out = dispatch()
        np.asarray(probe(out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = dispatch()
        np.asarray(probe(out))
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"{tag:>40}: {dt:8.2f} ms", flush=True)
        return dt

    r = {}
    r["track"] = timed(
        "track 30it S=64 fixed-batch",
        lambda: slam._track(slam.map_state, slam.decoder_params, p6,
                            slam.rays_dir, rgb_d, depth_d, slam._next_key(),
                            slam.point_store, zero),
        lambda o: o.pose)

    sel = jnp.arange(5, dtype=jnp.int32)
    valid = jnp.ones((5,), bool)
    st = {"store": slam.store, "dec": slam.decoder_params, "opt": slam.opt}

    def mp():
        res = slam._map(slam.map_state, st["dec"], st["store"], st["opt"],
                        slam.rays_dir, sel, valid, slam._next_key(),
                        slam.point_store)
        st["store"], st["dec"], st["opt"] = (res.store, res.decoder_params,
                                             res.opt)
        return res
    r["map"] = timed("map 10it 5slot S=64 fixed-batch", mp, lambda o: o.loss)

    mstate = {"ms": slam.map_state}

    def ins():
        out = slam._insert_jit(mstate["ms"], slam.point_store, rgb_d,
                               depth_d, p6, slam.rays_dir)
        mstate["ms"] = out[0]
        return mstate["ms"]
    r["insert"] = timed("insert (merged scatters)", ins,
                        lambda o: o.num_voxels)

    wstate = {"s": st["store"]}
    one = jnp.int32(1)
    jax.block_until_ready(one)

    def wr():
        wstate["s"] = slam._write(wstate["s"], one, rgb_d, depth_d, one,
                                  p6, p6, p6, zero)
        return wstate["s"]
    r["write"] = timed("write (staged)", wr, lambda o: o.stamps)

    total = sum(r.values())
    print(f"{'sum':>40}: {total:8.2f} ms -> {1000.0 / total:.2f} fps bound")


if __name__ == "__main__":
    main()
