"""Per-phase wall timing of the SLAM frame loop on the real device.

Times each jitted step (upload / track / write / map / insert) with
``block_until_ready`` fences over a few warm frames — the TPU analog of the
reference's named tick/tok profiler categories (`src/utils/profile_util.py`,
`tracking.py:128-157`). Async dispatch means the normal loop overlaps these
phases; fencing serializes them, so the per-phase numbers are upper bounds
and their sum exceeds the pipelined frames/s of `bench.py`.

The map is pre-grown to the reference's operating scale (>=10k voxels) by
inserting strided ground-truth depth clouds before profiling, so the
numbers reflect the scale the bench runs at, without replaying the whole
sequence under fences.

Usage: python scripts/profile_phases.py [n_frames] [pregrow_stride]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import bench_settings, load_or_make_dataset
    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.geometry import se3

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    pregrow_stride = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    settings = bench_settings()
    ds = load_or_make_dataset()
    slam = SlamSystem(settings, ds.intrinsics, (ds.height, ds.width), seed=0,
                      point_stride=2)

    rgb0, depth0 = ds.dequantized(0)
    t0 = time.perf_counter()
    slam.initialize(rgb0, depth0, ds.get_init_pose(), stamp=0)
    jax.block_until_ready(slam.map_state.embeddings)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # pre-grow the map to bench scale with ground-truth-pose insertions
    t0 = time.perf_counter()
    for i in range(0, len(ds), pregrow_stride):
        _, _, depth, _, pose = ds[i]
        _, depth_d = slam.upload_frame(np.zeros((1, 1, 3), np.uint8)
                                       * np.uint8(0), depth)
        pose6 = se3.tangent_from_matrix(jnp.asarray(pose, jnp.float32))
        slam.map_state = slam._insert(slam.map_state,
                                      jnp.zeros((ds.height, ds.width, 3)),
                                      depth_d, pose6)
    jax.block_until_ready(slam.map_state.voxel_keys)
    c = slam.counters()
    print(f"pregrow: {time.perf_counter() - t0:.1f}s -> "
          f"{c['num_voxels']} voxels, {c['num_cells']} cells",
          file=sys.stderr)
    slam.num_kf = min(9, settings.mapper.max_keyframes - 2)
    slam.kf_stamps = list(range(0, slam.num_kf * 51, 51))

    # drain background prewarm compiles — their dummy executions contend
    # with the fenced measurements below and would inflate every phase
    for th in slam._prewarm_threads:
        th.join()

    acc = {"upload": 0.0, "track": 0.0, "write": 0.0, "map": 0.0,
           "insert": 0.0}
    timed = 0
    base = 400
    for i in range(base, base + n_frames):
        _, rgb, depth, _, _ = ds[i]
        warm = i - base >= 3

        t = time.perf_counter()
        rgb_d, depth_d = slam.upload_frame(rgb, depth)
        jax.block_until_ready((rgb_d, depth_d))
        if warm:
            acc["upload"] += time.perf_counter() - t

        view = slam._render_view()

        t = time.perf_counter()
        result = slam._track(view, slam.decoder_params, slam.last_pose6,
                             slam.rays_dir, rgb_d, depth_d, slam._next_key(),
                             slam.point_store)
        jax.block_until_ready(result.pose)
        if warm:
            acc["track"] += time.perf_counter() - t

        slot = min(slam.num_kf, settings.mapper.max_keyframes - 1)
        t = time.perf_counter()
        slam.store = slam._write(
            slam.store, jnp.int32(slot), rgb_d, depth_d, jnp.int32(i),
            result.pose, result.adam_m, result.adam_v, result.adam_t)
        jax.block_until_ready(slam.store.stamps)
        if warm:
            acc["write"] += time.perf_counter() - t

        sel, valid = slam._select_window()
        t = time.perf_counter()
        res = slam._map(view, slam.decoder_params, slam.store, slam.opt,
                        slam.rays_dir, sel, valid, slam._next_key(),
                        slam.point_store)
        slam._merge_map_result(res)
        jax.block_until_ready(slam.map_state.embeddings)
        if warm:
            acc["map"] += time.perf_counter() - t

        refined = slam.store.poses[slot]
        t = time.perf_counter()
        slam.map_state = slam._insert(slam.map_state, rgb_d, depth_d,
                                      refined)
        jax.block_until_ready(slam.map_state.voxel_keys)
        if warm:
            acc["insert"] += time.perf_counter() - t

        slam._append_trajectory(slot)
        slam.last_pose6 = refined
        if warm:
            timed += 1

    total = sum(acc.values())
    print(f"\nper-frame phase times over {timed} warm frames "
          f"(fenced; serialized upper bounds):")
    for k, v in acc.items():
        print(f"  {k:>7}: {1000 * v / timed:7.2f} ms  "
              f"({100 * v / total:4.1f}%)")
    print(f"  {'total':>7}: {1000 * total / timed:7.2f} ms  "
          f"(pipelined bench will be faster)")
    print(f"counters: {slam.counters(exact=True)}")


if __name__ == "__main__":
    main()
