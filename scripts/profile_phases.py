"""Per-phase wall timing of the SLAM frame loop on the real device.

Times each jitted step (track / write / map / insert) with
``block_until_ready`` fences over a few warm frames — the TPU analog of the
reference's named tick/tok profiler categories (`src/utils/profile_util.py`,
`tracking.py:128-157`). Async dispatch means the normal loop overlaps these
phases; fencing serializes them, so the per-phase numbers are upper bounds
and their sum exceeds the pipelined frames/s of `bench.py`.

Usage: python scripts/profile_phases.py [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import load_or_make_dataset
    from proudslam_tpu.config import (
        DecoderSettings, LossSettings, MapSettings, MapperSettings,
        RenderSettings, SystemSettings, TrackerSettings)
    from proudslam_tpu.engine.slam import SlamSystem

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    settings = SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, truncation=0.1,
                              max_distance=10.0, max_hits=12, max_samples=40),
        map=MapSettings(voxel_size=0.2, num_embeddings=20000, embed_dim=16,
                        voxel_capacity=20000, frame_voxel_capacity=2048),
        decoder=DecoderSettings(depth=2, width=128, in_dim=16, sdf_dim=128),
        tracker=TrackerSettings(n_rays=1024, num_iterations=30,
                                learning_rate=0.01),
        mapper=MapperSettings(n_rays_each=1024, window_size=4,
                              num_iterations=10, keyframe_gap=50,
                              max_keyframes=64, init_iterations=100),
        loss=LossSettings(),
    )
    ds = load_or_make_dataset(20, 320, 240)
    slam = SlamSystem(settings, ds.intrinsics, (ds.height, ds.width), seed=0,
                      point_stride=2)

    _, rgb, depth, _, pose0 = ds[0]
    t0 = time.perf_counter()
    slam.initialize(rgb, depth, pose0, stamp=0)
    jax.block_until_ready(slam.map_state.embeddings)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    acc = {"upload": 0.0, "track": 0.0, "write": 0.0, "map": 0.0,
           "insert": 0.0}
    timed = 0
    for i in range(1, n_frames):
        _, rgb, depth, _, _ = ds[i]
        warm = i >= 3

        t = time.perf_counter()
        rgb_d, depth_d = slam.upload_frame(rgb, depth)
        jax.block_until_ready((rgb_d, depth_d))
        if warm:
            acc["upload"] += time.perf_counter() - t

        slam._maybe_prewarm_window(i)
        view = slam._render_view()

        t = time.perf_counter()
        result = slam._track(view, slam.decoder_params, slam.last_pose6,
                             slam.rays_dir, rgb_d, depth_d, slam._next_key())
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
                        slam.rays_dir, sel, valid, slam._next_key())
        slam._merge_map_result(res)
        jax.block_until_ready(slam.map_state.embeddings)
        if warm:
            acc["map"] += time.perf_counter() - t

        refined = slam.store.poses[slot]
        t = time.perf_counter()
        slam.map_state = slam._insert(slam.map_state, depth_d, refined)
        jax.block_until_ready(slam.map_state.voxel_keys)
        if warm:
            acc["insert"] += time.perf_counter() - t

        if i - slam.kf_stamps[slam.num_kf - 1] > settings.mapper.keyframe_gap \
                and slam.num_kf < settings.mapper.max_keyframes - 1:
            slam.num_kf += 1
            slam.kf_stamps.append(i)
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
    print(f"num_voxels={int(slam.map_state.num_voxels)}")


if __name__ == "__main__":
    main()
