"""Benchmark: tracked+mapped frames/s of the full SLAM loop on one chip,
at the reference's operating scale.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr.

Workload (matches the reference's Replica-room0 operating point,
`/root/reference/configs/replica/replica.yaml` + `src/mapping.py:136`):
480 frames of a 12x3.2x12 m analytic scene at 320x240, map growing past
10k SURFACE voxels at 0.2 m, keyframe commits every 12 stamps (~39
committed keyframes — denser anchors than the reference's 50-stamp rule at
identical per-frame compute; the apples-to-apples gap-50 row is in
BENCH_NOTES r4), per-frame budget = 30x1024-ray tracking iters +
10x(5x1024)-ray BA iters + voxel insertion.

The reference publishes no numbers (BASELINE.md); the upstream Vox-Fusion
system class runs ~2 frames/s on an RTX-3090-class GPU at this budget.
vs_baseline is reported against that 2 fps anchor; the driver target is
>= 3x (BASELINE.json).

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

N_FRAMES = 480
WIDTH, HEIGHT = 320, 240
RADIUS = 1.6
SCENE_VERSION = 6   # bump when AnalyticScene / trajectory changes


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_or_make_dataset(n_frames=N_FRAMES, width=WIDTH, height=HEIGHT,
                         trajectory="scan"):
    import numpy as np

    from proudslam_tpu.data.synthetic import BenchDataset

    cache = (CACHE if trajectory == "scan"
             else CACHE.replace(".npz", f".{trajectory}.npz"))
    if os.path.exists(cache):
        data = np.load(cache)
        ver = int(data["scene_version"]) if "scene_version" in data.files else 1
        if (int(data["n"]) == n_frames and int(data["w"]) == width
                and int(data["h"]) == height and ver == SCENE_VERSION):
            log("bench: using cached dataset")
            from proudslam_tpu.data.synthetic import AnalyticScene
            ds = BenchDataset.__new__(BenchDataset)
            ds.scene = AnalyticScene()   # mesh eval needs surface_distance
            ds.width, ds.height = width, height
            ds.max_depth = float(data["max_depth"])
            ds.fx = ds.fy = 0.9 * width
            ds.cx, ds.cy = (width - 1) / 2.0, (height - 1) / 2.0
            ds.depth_quant = 65535.0 / ds.max_depth
            ds.poses = list(data["poses"])
            # read each compressed member ONCE (npz __getitem__ decompresses
            # the whole member on every access)
            rgb, depth = data["rgb"], data["depth"]
            ds.frames = [(rgb[i], depth[i]) for i in range(n_frames)]
            return ds
    log("bench: generating dataset...")
    ds = BenchDataset(num_frames=n_frames, width=width, height=height,
                      radius=RADIUS, trajectory=trajectory)
    np.savez_compressed(
        cache, n=n_frames, w=width, h=height, scene_version=SCENE_VERSION,
        max_depth=ds.max_depth,
        poses=np.stack(ds.poses),
        rgb=np.stack([f[0] for f in ds.frames]),
        depth=np.stack([f[1] for f in ds.frames]))
    return ds


def bench_settings():
    from proudslam_tpu.config import (
        DecoderSettings, LossSettings, MapSettings, MapperSettings,
        RenderSettings, SystemSettings, TrackerSettings)

    # Reference iteration budget (30x1024 track + 10x(5x1024) BA), step
    # 0.02 m. Round-5 operating point (BENCH_NOTES r5): S=64 sample slots
    # (`adaptive_step` coarsens only the longest rays), per-round FIXED
    # ray batches (intersect+sample hoisted out of both Adam scans), and
    # a 1024-voxel steady-state insert budget — together 360 -> ~190 ms
    # per frame at unchanged iteration counts. Intersection is the
    # bucketed brute slab+top-k (DDA measured slower at bench scale even
    # hoisted: 186 vs 152 ms map step, probe_map r5; bucket-growth
    # recompiles are prewarmed off-thread).
    return SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, truncation=0.1,
                              max_distance=10.0, max_hits=12, max_samples=64,
                              intersect_mode="brute",
                              # tracker discounts rays dominated by the
                              # newest (half-trained) voxels — the main
                              # pan-drift source (BENCH_NOTES r4). The
                              # freshness window is scale-free: "allocated
                              # within the last 50 inserts" at whatever
                              # rate the scene produces (BENCH_NOTES r5)
                              fresh_window_frames=50),
        map=MapSettings(voxel_size=0.2, num_embeddings=40960, embed_dim=16,
                        voxel_capacity=20480, frame_voxel_capacity=4096,
                        frame_voxel_capacity_steady=1024),
        # fused_mlp off: the bf16 Pallas decoder wins standalone (7.7 vs
        # 13.4 ms fwd+bwd) but loses IN CONTEXT — the pallas_call boundary
        # blocks XLA's fusion of the gather einsum into the first matmul
        # and of the heads into the integration (track step 133 vs 65 ms,
        # map step 338 vs 250 ms measured, BENCH_NOTES r4)
        decoder=DecoderSettings(depth=2, width=128, in_dim=16, sdf_dim=128,
                                matmul_dtype="bf16"),
        # fresh_ray_floor 0.05: rays dominated by fresh voxels keep 5%
        # weight. The decisive drift knob — seed-1 ATE 9.0 -> 2.1 cm at
        # floor 0.2 vs 0.05 (r4 margin sweep found the same; BENCH_NOTES
        # r5 seed table)
        tracker=TrackerSettings(n_rays=1024, num_iterations=30,
                                learning_rate=0.01,
                                fixed_sample_batch=True,
                                fresh_ray_floor=0.05),
        # keyframe_gap 12: denser anchors than the reference's hardcoded
        # 50-stamp rule (`mapping.py:136`) at zero per-frame compute cost
        # (window size and BA iterations unchanged); best mean ATE over a
        # 3-seed config sweep (BENCH_NOTES r4; the gap-50 row is reported
        # there for apples-to-apples comparison)
        # insert_stride 2: consecutive 1-cm-apart frames allocate nearly
        # identical voxel sets; halving the cadence costs nothing the
        # fresh-ray weighting doesn't already absorb (3-seed ATE mean
        # 2.95 vs 3.75 cm at stride 1 — BENCH_NOTES r5) and saves
        # ~5 ms/frame
        mapper=MapperSettings(n_rays_each=1024, window_size=4,
                              num_iterations=10, keyframe_gap=12,
                              max_keyframes=64, init_iterations=200,
                              fixed_sample_batch=True, insert_stride=2),
        loss=LossSettings(),
    )


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

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.utils.metrics import ate_rmse, rpe_rmse

    settings = bench_settings()
    n_frames = N_FRAMES
    ds = load_or_make_dataset()

    slam = SlamSystem(settings, ds.intrinsics, (ds.height, ds.width), seed=0,
                      point_stride=2)

    t0 = time.perf_counter()
    rgb0, depth0 = ds.dequantized(0)
    slam.initialize(rgb0, depth0, ds.get_init_pose(), stamp=0)
    log(f"bench: initialize (incl. compiles) {time.perf_counter() - t0:.0f}s")

    import jax

    warmup = 3
    t0 = time.perf_counter()
    timed = 0
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
        if i % 120 == 0:
            log(f"bench: frame {i}/{n_frames} "
                f"voxels={slam.counters()['num_voxels']} kf={slam.num_kf} "
                f"({timed / max(time.perf_counter() - t0, 1e-9):.2f} fps)")
    # all work is dispatched asynchronously; include completion in the time
    jax.block_until_ready(slam.map_state.embeddings)
    elapsed = time.perf_counter() - t0

    fps = timed / elapsed
    gt = np.stack(ds.poses)
    est_online = slam.get_trajectory()
    ate_online_cm = ate_rmse(est_online, gt[:len(est_online)],
                             align=False) * 100
    # pose-updating global BA over all keyframes (the reference's final
    # refinement freezes poses — this corrects accumulated drift and is
    # reported separately from the online loop timing)
    t0 = time.perf_counter()
    slam.global_refine(rounds=2)
    jax.block_until_ready(slam.map_state.embeddings)
    refine_s = time.perf_counter() - t0
    est = slam.get_trajectory()
    gt = gt[:len(est)]
    ate_cm = ate_rmse(est, gt, align=False) * 100
    # the literature metric (Vox-Fusion/NICE-SLAM table convention) is
    # ATE after trajectory alignment — gauge freedom removed. Unaligned
    # (the headline here, stricter) additionally charges the global
    # map/trajectory gauge bend against a single first-frame anchor.
    ate_al_cm = ate_rmse(est, gt, align=True) * 100
    rpe_cm = rpe_rmse(est, gt, delta=1) * 100
    counters = slam.counters(exact=True)

    # quantitative mesh eval vs the analytic scene (exact surface SDF):
    # accuracy = mean vertex->surface distance; completion = mean
    # GT-surface-sample -> nearest-vertex distance (observed region only
    # — GT samples come from the dataset's own depth maps)
    mesh_acc_cm = mesh_comp_cm = -1.0
    try:
        from scipy.spatial import cKDTree

        from proudslam_tpu.mesher import extract_mesh
        m = extract_mesh(slam.map_state, slam.decoder_params, settings.map,
                         settings.decoder, require_color=False)
        if len(m.verts):
            mesh_acc_cm = float(np.mean(
                ds.scene.surface_distance(m.verts))) * 100
            samp = []
            fx, fy, cx, cy = ds.intrinsics
            ys, xs = np.mgrid[0:HEIGHT:4, 0:WIDTH:4]
            dirs = np.stack([(xs - cx) / fx, (ys - cy) / fy,
                             np.ones_like(xs, np.float32)], axis=-1)
            for i in range(0, n_frames, 30):
                _, d = ds.dequantized(i)
                pose = gt[min(i, len(gt) - 1)]
                pts = dirs * d[::4, ::4, None]
                pts = pts.reshape(-1, 3)[(d[::4, ::4] > 0).reshape(-1)]
                samp.append(pts @ pose[:3, :3].T + pose[:3, 3])
            gt_pts = np.concatenate(samp)
            mesh_comp_cm = float(np.mean(
                cKDTree(m.verts).query(gt_pts)[0])) * 100
        log(f"bench: mesh {len(m.verts)} verts  acc {mesh_acc_cm:.2f} cm  "
            f"comp {mesh_comp_cm:.2f} cm")
    except Exception as e:  # mesh eval must not kill the bench line
        log(f"bench: mesh eval failed: {type(e).__name__}: {e}")

    result = {
        "metric": "tracked_frames_per_second",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 2.0, 3),
        "extra": {
            "ate_rmse_cm": round(ate_cm, 3),
            "ate_aligned_cm": round(ate_al_cm, 3),
            "ate_online_cm": round(ate_online_cm, 3),
            "global_refine_s": round(refine_s, 1),
            "mesh_acc_cm": round(mesh_acc_cm, 3),
            "mesh_comp_cm": round(mesh_comp_cm, 3),
            "rpe_rmse_cm": round(rpe_cm, 4),
            "frames_timed": timed,
            "num_voxels": counters["num_voxels"],
            "num_cells": counters["num_cells"],
            "voxel_capacity": settings.map.voxel_capacity,
            "cell_capacity": settings.map.num_embeddings,
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
