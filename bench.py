"""Benchmark: tracked+mapped frames/s of the full SLAM loop on one chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

The reference publishes no numbers (BASELINE.md); the upstream Vox-Fusion
system class runs ~2 frames/s on an RTX-3090-class GPU at the reference's
compute budget (30x1024-ray tracking iters + 10x5x1024-ray mapping iters
per frame). vs_baseline is reported against that 2 fps anchor; the driver
target is >= 3x (BASELINE.json).

Environment notes: the first device->host transfer through the remote-TPU
tunnel pays a one-time multi-minute initialization — it is warmed up in a
background thread while the synthetic dataset generates (and the dataset is
cached on disk for later runs).
"""

import json
import os
import sys
import threading
import time

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_data.npz")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_or_make_dataset(n_frames, width, height):
    import numpy as np

    from proudslam_tpu.data.synthetic import SyntheticDataset

    if os.path.exists(CACHE):
        data = np.load(CACHE)
        if (int(data["n"]) == n_frames and int(data["w"]) == width
                and int(data["h"]) == height):
            log("bench: using cached dataset")
            ds = SyntheticDataset.__new__(SyntheticDataset)
            ds.width, ds.height = width, height
            ds.fx = ds.fy = 0.9 * width
            ds.cx, ds.cy = (width - 1) / 2.0, (height - 1) / 2.0
            ds.poses = list(data["poses"])
            ds.frames = [(data["rgb"][i], data["depth"][i])
                         for i in range(n_frames)]
            return ds
    log("bench: generating dataset...")
    ds = SyntheticDataset(num_frames=n_frames, width=width, height=height)
    np.savez_compressed(
        CACHE, n=n_frames, w=width, h=height,
        poses=np.stack(ds.poses),
        rgb=np.stack([f[0] for f in ds.frames]),
        depth=np.stack([f[1] for f in ds.frames]))
    return ds


def main():
    import numpy as np

    # warm up the tunnel's device->host path concurrently with data prep
    def _warmup():
        import jax
        import jax.numpy as jnp
        t0 = time.perf_counter()
        np.asarray(jnp.ones((8,)))
        log(f"bench: D2H warmup done in {time.perf_counter() - t0:.0f}s")

    th = threading.Thread(target=_warmup, daemon=True)
    th.start()

    from proudslam_tpu.config import (
        DecoderSettings, LossSettings, MapSettings, MapperSettings,
        RenderSettings, SystemSettings, TrackerSettings)
    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.utils.metrics import ate_rmse

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

    n_frames = 20
    ds = load_or_make_dataset(n_frames, 320, 240)

    slam = SlamSystem(settings, ds.intrinsics, (ds.height, ds.width), seed=0,
                      point_stride=2)

    t0 = time.perf_counter()
    _, rgb, depth, _, pose0 = ds[0]
    slam.initialize(rgb, depth, pose0, stamp=0)
    log(f"bench: initialize (incl. compiles) {time.perf_counter() - t0:.0f}s")

    import jax

    warmup = 3
    t0 = time.perf_counter()
    timed = 0
    elapsed = None
    _, rgb, depth, _, _ = ds[1]
    pending = slam.upload_frame(rgb, depth)   # prefetch overlaps compute
    for i in range(1, n_frames):
        if i == 1 + warmup:                   # end of warmup
            jax.block_until_ready(slam.map_state.embeddings)
            log(f"bench: warmup frames {time.perf_counter() - t0:.0f}s")
            th.join()   # D2H warmup must not contend with the timed section
            t0 = time.perf_counter()
        cur = pending
        if i + 1 < n_frames:
            _, rgb, depth, _, _ = ds[i + 1]
            pending = slam.upload_frame(rgb, depth)
        slam.process_frame(i, *cur)
        if i >= 1 + warmup:
            timed += 1
    # all work is dispatched asynchronously; include completion in the time
    jax.block_until_ready(slam.map_state.embeddings)
    elapsed = time.perf_counter() - t0

    fps = timed / elapsed
    est = slam.get_trajectory()
    gt = np.stack(ds.poses)[:len(est)]
    ate_cm = ate_rmse(est, gt, align=False) * 100

    result = {
        "metric": "tracked_frames_per_second",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2.0, 3),
        "extra": {
            "ate_rmse_cm": round(ate_cm, 3),
            "frames_timed": timed,
            "num_voxels": int(slam.map_state.num_voxels),
            "num_keyframes": slam.num_kf,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # the driver needs a JSON line no matter what
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "tracked_frames_per_second", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200]}))
        sys.exit(0)
