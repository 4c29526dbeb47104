#!/usr/bin/env python
"""Map-step decomposition probes: fixed vs per-iteration cost, DDA with
hoisted occupancy, interp-einsum precision — all at the production 5-slot
window and S=64.

Usage: python scripts/probe_map.py [N] [V]
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

    def mk_slam(settings):
        H, W = 240, 320
        slam = SlamSystem(settings,
                          (0.9 * W, 0.9 * W, (W - 1) / 2, (H - 1) / 2),
                          (H, W), seed=0, point_stride=2)
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(V * 3, 3))
        pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
        pts[:V, 1] = -1.5
        coords = np.unique(
            np.floor(pts / 0.2).astype(np.int64), axis=0)[:V]
        ms0 = vh.build_map_state_numpy(coords, settings.map)
        slam.map_state = ms0._replace(embeddings=slam.map_state.embeddings)
        return slam

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

    base = bench_settings()
    base = dataclasses.replace(base, render=dataclasses.replace(
        base.render, max_samples=64))
    H, W = 240, 320
    rgb_d = jnp.full((H, W, 3), 0.5)
    depth_d = jnp.full((H, W), 2.0)
    jax.block_until_ready(rgb_d)

    def map_bench(tag, s, wsel=5, iters=None):
        if iters is not None:
            s = dataclasses.replace(s, mapper=dataclasses.replace(
                s.mapper, num_iterations=iters))
        sl = mk_slam(s)
        sel = jnp.arange(wsel, dtype=jnp.int32)
        valid = jnp.ones((wsel,), bool)
        st = {"store": sl.store, "dec": sl.decoder_params, "opt": sl.opt}

        def mp():
            res = sl._map(sl.map_state, st["dec"], st["store"], st["opt"],
                          sl.rays_dir, sel, valid, sl._next_key(),
                          sl.point_store)
            st["store"], st["dec"], st["opt"] = (res.store,
                                                 res.decoder_params, res.opt)
            return res
        return timed(tag, mp, lambda o: o.loss)

    t10 = map_bench("map 10it 5slot S=64 brute", base)
    t2 = map_bench("map 2it 5slot S=64 brute", base, iters=2)
    print(f"{'-> per-iter':>40}: {(t10 - t2) / 8.0:8.2f} ms   "
          f"fixed: {t2 - 2 * (t10 - t2) / 8.0:.2f} ms", flush=True)

    dda = dataclasses.replace(base, render=dataclasses.replace(
        base.render, intersect_mode="dda"))
    map_bench("map 10it 5slot S=64 dda(hoisted)", dda)

    # interp einsum precision DEFAULT
    from proudslam_tpu.ops import interp
    interp.EINSUM_PREC = jax.lax.Precision.DEFAULT
    map_bench("map 10it 5slot S=64 brute PREC=def", base)

    # track with DEFAULT einsums
    sl = mk_slam(base)
    p6 = jnp.zeros((6,))

    def tr():
        return sl._track(sl.map_state, sl.decoder_params, p6, sl.rays_dir,
                         rgb_d, depth_d, sl._next_key(), sl.point_store,
                         jnp.int32(0))
    timed("track 30it S=64 PREC=def", tr, lambda o: o.pose)
    interp.EINSUM_PREC = jax.lax.Precision.HIGHEST


if __name__ == "__main__":
    main()
