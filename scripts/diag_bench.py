#!/usr/bin/env python
"""Accuracy/perf diagnostic runs of the bench workload.

Runs the full SLAM loop over (a prefix of) the cached bench dataset with
CLI-overridable settings and reports everything needed to localize a
tracking/mapping failure:

* per-segment fps (flat-ness = no compile churn),
* per-frame translation error vs ground truth (the drift curve),
* per-frame tracker loss + hit ratio (already computed on device,
  `engine/tracker.py:30-37`; previously dropped),
* final ATE/RPE,
* optional rendered-vs-gt panels at chosen frames.

Usage:
    python scripts/diag_bench.py --frames 120 --max_hits 24 --max_samples 96 \
        --intersect dda --keyframe_gap 25 --tag full-budget

Writes a JSON summary line to stdout and per-frame curves to
``diag/<tag>.npz`` for offline comparison.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--max_hits", type=int, default=12)
    ap.add_argument("--max_samples", type=int, default=40)
    ap.add_argument("--intersect", default="brute", choices=["brute", "dda"])
    ap.add_argument("--keyframe_gap", type=int, default=50)
    ap.add_argument("--window_size", type=int, default=4)
    ap.add_argument("--step_size", type=float, default=0.02)
    ap.add_argument("--track_iters", type=int, default=30)
    ap.add_argument("--map_iters", type=int, default=10)
    ap.add_argument("--n_rays", type=int, default=1024)
    ap.add_argument("--adaptive", default="true")
    ap.add_argument("--matmul", default=None, choices=[None, "f32", "bf16"],
                    help="decoder MLP matmul dtype (default: bench setting)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="multiplicative depth noise sigma (e.g. 0.01) "
                         "applied to the cached dataset in memory")
    ap.add_argument("--sampler", default=None,
                    choices=[None, "uniform", "gumbel"])
    ap.add_argument("--fresh_margin", type=int, default=0,
                    help="render.fresh_voxel_margin (tracker discounts "
                         "rays hitting the newest N voxel slots)")
    ap.add_argument("--fresh_window", type=int, default=0,
                    help="render.fresh_window_frames (scale-free fresh "
                         "threshold: voxels allocated in the last N "
                         "frames; overrides fresh_margin)")
    ap.add_argument("--fixed_batch", default="false",
                    help="fixed per-round ray batches (tracker+mapper)")
    ap.add_argument("--insert_stride", type=int, default=1)
    ap.add_argument("--anchor", type=int, default=-1,
                    help="mapper.anchor_keyframes (-1 = bench default)")
    ap.add_argument("--wanchor", default=None,
                    help="mapper.window_include_anchor (true/false)")
    ap.add_argument("--rebake", type=int, default=0,
                    help="after --refine: rebake_map(N) + 1 more refine")
    ap.add_argument("--covis", type=float, default=-1.0,
                    help="mapper.covis_angle_deg (-1 = bench default, "
                         "0 = uniform window selection)")
    ap.add_argument("--steady_cap", type=int, default=-1,
                    help="map.frame_voxel_capacity_steady (-1 = bench "
                         "default, 0 = full capacity every insert)")
    ap.add_argument("--trajectory", default="scan",
                    choices=["scan", "monotonic", "corridor"],
                    help="BenchDataset trajectory family (cached "
                         "separately)")
    ap.add_argument("--fresh_floor", type=float, default=None,
                    help="tracker.fresh_ray_floor (min weight for "
                         "fresh-dominated rays)")
    ap.add_argument("--midrefine", type=int, default=0,
                    help="every N frames, run one global_refine sweep "
                         "mid-run (corrects drift before it compounds)")
    ap.add_argument("--refine", type=int, default=0,
                    help="global_refine rounds after the run (ATE "
                         "reported post-refine)")
    ap.add_argument("--segment", type=int, default=40)
    ap.add_argument("--panels", type=str, default="",
                    help="comma-separated frame indices to dump panels at")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tag", default="diag")
    args = ap.parse_args()

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    import threading

    import jax
    import numpy as np

    # warm the tunnel's device->host path off the critical path (first
    # fetch of a device buffer pays a one-time multi-minute init)
    def _warmup():
        import jax.numpy as jnp
        np.asarray(jnp.ones((8,)))
    threading.Thread(target=_warmup, daemon=True).start()

    from bench import bench_settings, load_or_make_dataset
    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.utils.metrics import ate_rmse, rpe_rmse

    base = bench_settings()
    import dataclasses
    if args.steady_cap >= 0:
        base = dataclasses.replace(base, map=dataclasses.replace(
            base.map, frame_voxel_capacity_steady=args.steady_cap))
    settings = dataclasses.replace(
        base,
        render=dataclasses.replace(
            base.render, max_hits=args.max_hits, max_samples=args.max_samples,
            intersect_mode=args.intersect, step_size=args.step_size,
            adaptive_step=args.adaptive.lower() == "true",
            fresh_voxel_margin=args.fresh_margin,
            fresh_window_frames=args.fresh_window,
            **({"pixel_sampler": args.sampler} if args.sampler else {})),
        decoder=(dataclasses.replace(base.decoder, matmul_dtype=args.matmul)
                 if args.matmul else base.decoder),
        tracker=dataclasses.replace(
            base.tracker, num_iterations=args.track_iters,
            n_rays=args.n_rays,
            fixed_sample_batch=args.fixed_batch.lower() == "true",
            **({"fresh_ray_floor": args.fresh_floor}
               if args.fresh_floor is not None else {})),
        mapper=dataclasses.replace(
            base.mapper, keyframe_gap=args.keyframe_gap,
            window_size=args.window_size, num_iterations=args.map_iters,
            fixed_sample_batch=args.fixed_batch.lower() == "true",
            insert_stride=args.insert_stride,
            **({"covis_angle_deg": args.covis} if args.covis >= 0 else {}),
            **({"anchor_keyframes": args.anchor} if args.anchor >= 0
               else {}),
            **({"window_include_anchor": args.wanchor.lower() == "true"}
               if args.wanchor is not None else {})),
    )
    ds = load_or_make_dataset(trajectory=args.trajectory)
    if args.noise > 0.0:
        # Kinect-like multiplicative depth noise (BenchDataset.depth_noise
        # semantics) applied to the cached quantized frames
        rng = np.random.default_rng(7)
        for i in range(len(ds.frames)):
            rgb_q, d_q = ds.frames[i]
            d = d_q.astype(np.float32) / ds.depth_quant
            n = rng.normal(0.0, args.noise, d.shape).astype(np.float32)
            d = np.where(d > 0.0, np.maximum(d * (1.0 + n), 0.01), 0.0)
            ds.frames[i] = (rgb_q, np.clip(
                d * ds.depth_quant + 0.5, 0, 65535.0).astype(np.uint16))
    n_frames = min(args.frames, len(ds))

    slam = SlamSystem(settings, ds.intrinsics, (ds.height, ds.width),
                      seed=args.seed,
                      point_stride=2)
    t0 = time.perf_counter()
    rgb0, depth0 = ds.dequantized(0)
    slam.initialize(rgb0, depth0, ds.get_init_pose(), stamp=0)
    print(f"init (incl. compiles): {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    panel_at = set(int(x) for x in args.panels.split(",") if x)
    seg_fps = []
    t0 = time.perf_counter()
    seg_t0, seg_n = t0, 0
    _, rgb, depth, _, _ = ds[1]
    pending = slam.upload_frame(rgb, depth)
    for i in range(1, n_frames):
        cur = pending
        if i + 1 < n_frames:
            _, rgb, depth, _, _ = ds[i + 1]
            pending = slam.upload_frame(rgb, depth)
        slam.process_frame(i, *cur)
        if args.midrefine and i % args.midrefine == 0:
            slam.global_refine(rounds=1, anchored=True)
        seg_n += 1
        if i % args.segment == 0:
            jax.block_until_ready(slam.map_state.embeddings)
            now = time.perf_counter()
            fps = seg_n / (now - seg_t0)
            seg_fps.append(round(fps, 2))
            print(f"frame {i}/{n_frames} seg_fps={fps:.2f} "
                  f"voxels={slam.counters()['num_voxels']} kf={slam.num_kf}",
                  file=sys.stderr, flush=True)
            seg_t0, seg_n = now, 0
        if i in panel_at:
            _dump_panel(slam, ds, i, settings, args.tag)
    jax.block_until_ready(slam.map_state.embeddings)
    elapsed = time.perf_counter() - t0
    fps = (n_frames - 1) / elapsed

    if args.refine > 0:
        slam.global_refine(rounds=args.refine)
    if args.rebake > 0:
        slam.rebake_map(iterations=args.rebake)
        slam.global_refine(rounds=1)
    est = slam.get_trajectory()
    gt = np.stack(ds.poses)[:len(est)]
    err_t = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1) * 100
    stats = slam.get_track_stats()
    ate_cm = ate_rmse(est, gt, align=False) * 100
    ate_al_cm = ate_rmse(est, gt, align=True) * 100
    rpe_cm = rpe_rmse(est, gt, delta=1) * 100

    os.makedirs("diag", exist_ok=True)
    np.savez(f"diag/{args.tag}.npz", err_t_cm=err_t,
             track_loss=stats["track_loss"], hit_ratio=stats["hit_ratio"],
             map_loss=stats["map_loss"], est=est, gt=gt,
             tracked_pose6=stats["tracked_pose6"],
             refined_pose6=stats["refined_pose6"],
             seg_fps=np.asarray(seg_fps))

    q = lambda a: [round(float(np.percentile(a, p)), 4)
                   for p in (50, 90, 99)] if len(a) else []
    out = {
        "tag": args.tag, "frames": n_frames, "fps": round(fps, 2),
        "seg_fps": seg_fps,
        "ate_cm": round(float(ate_cm), 3),
        "ate_al_cm": round(float(ate_al_cm), 3),
        "rpe_cm": round(float(rpe_cm), 3),
        "err_t_cm_p50_p90_p99": q(err_t),
        "err_t_cm_final": round(float(err_t[-1]), 3),
        "track_loss_p50_p90_p99": q(stats["track_loss"]),
        "hit_ratio_min": round(float(stats["hit_ratio"].min()), 4)
        if len(stats["hit_ratio"]) else None,
        "counters": slam.counters(exact=True), "kf": slam.num_kf,
    }
    print(json.dumps(out), flush=True)


def _dump_panel(slam, ds, i, settings, tag):
    import numpy as np
    from proudslam_tpu.render.preview import render_preview
    w_r, h_r = 160, 120
    prgb, pdepth = render_preview(
        slam.map_state, slam.decoder_params, slam.last_pose6,
        settings, w_r, h_r, ds.intrinsics, (ds.width, ds.height))
    rgb, depth = ds.dequantized(i)
    os.makedirs("diag", exist_ok=True)
    np.savez(f"diag/{tag}_panel_{i}.npz", prgb=prgb, pdepth=pdepth,
             rgb=rgb[::2, ::2], depth=depth[::2, ::2])
    print(f"panel dumped at frame {i}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
