#!/usr/bin/env python
"""Insert-step internals: which stage costs the 26 ms, and what a smaller
frame_voxel_capacity buys at steady state.

Usage: python scripts/probe_insert.py [N] [V]
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
    from proudslam_tpu.ops import voxel_hash as vh

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 13000
    base = bench_settings()

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(V * 3, 3))
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) * 4.0
    pts[:V, 1] = -1.5
    coords = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)[:V]
    state = vh.build_map_state_numpy(coords, base.map)

    Np = 19200  # point_stride-2 cloud of a 320x240 frame
    pts_f = jnp.asarray(rng.normal(size=(Np, 3)) * 2.0, jnp.float32)
    valid = jnp.ones((Np,), bool)
    jax.block_until_ready(pts_f)

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
        print(f"{tag:>44}: {dt:8.2f} ms", flush=True)
        return dt

    for F in (4096, 1024, 512):
        s = dataclasses.replace(base, map=dataclasses.replace(
            base.map, frame_voxel_capacity=F))
        ins = jax.jit(lambda st, p, v, _s=s: vh.insert_points(
            st, p, v, _s.map))
        mstate = {"st": state}

        def d():
            mstate["st"] = ins(mstate["st"], pts_f, valid)
            return mstate["st"]
        timed(f"insert_points F={F}", d, lambda o: o.num_voxels)

    # stage costs at F=4096
    F = 4096
    keyf = jax.jit(lambda p, v: jnp.unique(
        jnp.where(v, vh.pack_coords(
            jnp.floor(p / 0.2).astype(jnp.int32), 10), vh.SENTINEL),
        size=F, fill_value=vh.SENTINEL))
    timed("unique(points->frame keys) F=4096",
          lambda: keyf(pts_f, valid), lambda o: o)

    fk = keyf(pts_f, valid)
    cornerf = jax.jit(lambda k: jnp.unique(
        jnp.where((k != vh.SENTINEL)[:, None],
                  vh.pack_coords(
                      vh.unpack_key(k, 10)[:, None, :]
                      + jnp.asarray(vh.CORNER_OFFSETS)[None], 10),
                  vh.SENTINEL).reshape(-1),
        size=8 * F, fill_value=vh.SENTINEL))
    timed("unique(corner keys) 8F=32768",
          lambda: cornerf(fk), lambda o: o)

    sortf = jax.jit(lambda x: jnp.argsort(x))
    big = jax.random.randint(jax.random.PRNGKey(0), (8 * F,), 0, 1 << 30)
    timed("argsort 32768", lambda: sortf(big), lambda o: o)


if __name__ == "__main__":
    main()
