#!/usr/bin/env python
"""Round-5 targeted probes on the real chip (chained-dispatch timing).

1. write: fresh host jnp.int32 scalars per call vs pre-staged device
   scalars — isolates the tunnel's per-H2D cost hiding in the frame loop.
2. map_step full 10-iteration scan at S=96/80/64 and track at S=64 —
   the true (in-scan) savings, unlike ablate_map's per-dispatch numbers.

Usage: python scripts/probe_r5.py [N] [V]
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
        print(f"{tag:>36}: {dt:8.2f} ms", flush=True)
        return dt

    base = bench_settings()
    slam = mk_slam(base)
    H, W = 240, 320
    rgb_d = jnp.full((H, W, 3), 0.5)
    depth_d = jnp.full((H, W), 2.0)
    p6 = jnp.zeros((6,))
    jax.block_until_ready(rgb_d)

    # -- write: host scalars vs staged device scalars -------------------
    wstate = {"s": slam.store}

    def wr_host():
        wstate["s"] = slam._write(
            wstate["s"], jnp.int32(1), rgb_d, depth_d, jnp.int32(1),
            p6, p6, p6, jnp.zeros((), jnp.int32))
        return wstate["s"]
    timed("write (fresh host scalars)", wr_host, lambda o: o.stamps)

    one = jnp.int32(1)
    zero = jnp.zeros((), jnp.int32)
    jax.block_until_ready((one, zero))

    def wr_dev():
        wstate["s"] = slam._write(
            wstate["s"], one, rgb_d, depth_d, one, p6, p6, p6, zero)
        return wstate["s"]
    timed("write (staged device scalars)", wr_dev, lambda o: o.stamps)

    # -- insert with staged args ----------------------------------------
    mstate = {"ms": slam.map_state}

    def ins():
        mstate["ms"], _, _, _ = slam._insert_jit(
            mstate["ms"], slam.point_store, rgb_d, depth_d, p6,
            slam.rays_dir)
        return mstate["ms"]
    timed("insert", ins, lambda o: o.num_voxels)
    slam.map_state = mstate["ms"]

    # -- track/map at S variants ----------------------------------------
    for S, Hh in ((96, 12), (80, 12), (64, 12), (64, 10), (48, 10)):
        s = dataclasses.replace(base, render=dataclasses.replace(
            base.render, max_samples=S, max_hits=Hh))
        sl = mk_slam(s)
        sel = jnp.arange(6, dtype=jnp.int32)
        valid = jnp.ones((6,), bool)
        st = {"store": sl.store, "dec": sl.decoder_params, "opt": sl.opt}

        def tr():
            return sl._track(sl.map_state, st["dec"], p6, sl.rays_dir,
                             rgb_d, depth_d, sl._next_key(),
                             sl.point_store, jnp.int32(0))
        timed(f"track 30it S={S} H={Hh}", tr, lambda o: o.pose)

        def mp():
            res = sl._map(sl.map_state, st["dec"], st["store"], st["opt"],
                          sl.rays_dir, sel, valid, sl._next_key(),
                          sl.point_store)
            st["store"], st["dec"], st["opt"] = (res.store,
                                                 res.decoder_params, res.opt)
            return res
        timed(f"map 10it S={S} H={Hh}", mp, lambda o: o.loss)


if __name__ == "__main__":
    main()
