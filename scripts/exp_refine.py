#!/usr/bin/env python
"""A/B different end-of-run refinement strategies on ONE completed run.

Runs the bench loop once, snapshots (map, decoder, keyframe store, opt),
then evaluates each strategy from the same snapshot: final pose-updating
BA variants (sweep counts, covisibility windows, map re-bake) and reports
ATE for each. Drives the VERDICT item-2 accuracy work without paying a
full bench run per idea.

Usage: python scripts/exp_refine.py [--frames 480]
"""

import argparse
import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def snapshot(slam):
    import jax
    import jax.numpy as jnp
    cp = lambda t: jax.tree.map(jnp.copy, t)
    return (cp(slam.map_state), cp(slam.decoder_params), cp(slam.store),
            cp(slam.opt), list(slam.frame_poses), slam.num_kf,
            list(slam.kf_stamps))


def restore(slam, snap):
    # fresh copies: the refine strategies DONATE store/opt/decoder buffers,
    # so handing out the snapshot arrays themselves would invalidate them
    import jax
    import jax.numpy as jnp
    cp = lambda t: jax.tree.map(jnp.copy, t)
    slam.map_state = cp(snap[0])
    slam.decoder_params = cp(snap[1])
    slam.store = cp(snap[2])
    slam.opt = cp(snap[3])
    slam.frame_poses = list(snap[4])
    slam.num_kf = snap[5]
    slam.kf_stamps = list(snap[6])


def ate(slam, gt):
    import numpy as np
    from proudslam_tpu.utils.metrics import ate_rmse
    est = slam.get_trajectory()
    return ate_rmse(est, gt[:len(est)], align=False) * 100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=480)
    args = ap.parse_args()

    import numpy as np
    import threading
    threading.Thread(
        target=lambda: __import__("numpy").asarray(
            __import__("jax.numpy", fromlist=["ones"]).ones((8,))),
        daemon=True).start()

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()
    from bench import bench_settings, load_or_make_dataset
    from proudslam_tpu.engine.slam import SlamSystem

    settings = bench_settings()
    ds = load_or_make_dataset()
    n = min(args.frames, len(ds))
    gt = np.stack(ds.poses)

    slam = SlamSystem(settings, ds.intrinsics, (ds.height, ds.width),
                      seed=0, point_stride=2)
    rgb0, depth0 = ds.dequantized(0)
    slam.initialize(rgb0, depth0, ds.get_init_pose(), stamp=0)
    t0 = time.perf_counter()
    for i in range(1, n):
        _, rgb, depth, _, _ = ds[i]
        slam.process_frame(i, rgb, depth)
        if i % 120 == 0:
            print(f"frame {i}/{n}", file=sys.stderr, flush=True)
    print(f"run: {time.perf_counter() - t0:.0f}s", file=sys.stderr,
          flush=True)

    snap = snapshot(slam)
    print(f"online            : ATE {ate(slam, gt):.3f} cm", flush=True)

    for rounds in (2, 6):
        restore(slam, snap)
        t0 = time.perf_counter()
        slam.global_refine(rounds=rounds)
        print(f"sweep rounds={rounds}    : ATE {ate(slam, gt):.3f} cm "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    for rounds in (2, 6):
        restore(slam, snap)
        t0 = time.perf_counter()
        slam.global_refine(rounds=rounds, anchored=True)
        print(f"anchored rounds={rounds} : ATE {ate(slam, gt):.3f} cm "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    restore(slam, snap)
    t0 = time.perf_counter()
    for it in range(2):
        slam.global_refine(rounds=2, anchored=True)
        slam.rebake_map(iterations=200)
    slam.global_refine(rounds=2, anchored=True)
    print(f"anchored+rebake x2: ATE {ate(slam, gt):.3f} cm "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # map re-bake alternation: refine poses, re-train map from scratch at
    # the refined poses, refine poses again
    restore(slam, snap)
    t0 = time.perf_counter()
    for it in range(2):
        slam.global_refine(rounds=2)
        slam.rebake_map(iterations=200)
    slam.global_refine(rounds=2)
    print(f"rebake x2         : ATE {ate(slam, gt):.3f} cm "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
