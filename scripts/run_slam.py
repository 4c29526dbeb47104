#!/usr/bin/env python
"""CLI entry point (reference `demo/run.py`):

    python scripts/run_slam.py configs/replica/room_0.yaml [--key value ...]

Loads the YAML config (with base_config inheritance), builds the dataset
and SLAM system, runs tracking+mapping over the sequence, then saves the
trajectory, mesh, checkpoint, and metrics. Dotted CLI overrides are
supported: ``--tracker_specs.num_iterations 20``.
"""

import argparse
import os
import sys
import time

import numpy as np

# allow running from a source checkout without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_overrides(extra):
    out = {}
    i = 0
    while i < len(extra):
        key = extra[i].lstrip("-")
        val = extra[i + 1]
        for cast in (int, float):
            try:
                val = cast(val)
                break
            except ValueError:
                continue
        if val in ("true", "True"):
            val = True
        elif val in ("false", "False"):
            val = False
        out[key] = val
        i += 2
    return out


def accumulate_depth_cloud(dataset, traj, start, settings,
                           max_frames: int = 60, pixel_stride: int = 4):
    """Bounded world-space depth point cloud over the run, for mesh
    cleaning (reference accumulates per-frame clouds and voxel-downsamples
    them, `mesh_util.py:22-26,90-102`).

    Backprojects a strided subset of frames at the *final* optimized
    trajectory poses. Accumulation is deduplicated through the native
    ``PointStore`` voxel hash (SURVEY.md N2) when the C++ extension is
    available, with a pure-numpy downsample fallback.
    """
    import numpy as np

    n = len(traj)
    frame_stride = max(1, n // max_frames)
    fx, fy, cx, cy = dataset.intrinsics

    store = None
    try:
        from proudslam_tpu.native import PointStore, native_available
        if native_available():
            store = PointStore(settings.map.voxel_size * 0.25,
                               max_voxels=1 << 19, points_per_voxel=2)
    except Exception:
        store = None
    chunks = []
    for j in range(0, n, frame_stride):
        try:
            _, _, depth, _, _ = dataset[start + j]
        except Exception:
            continue
        d = np.asarray(depth)[::pixel_stride, ::pixel_stride]
        h, w = d.shape
        iy, ix = np.mgrid[0:h, 0:w] * pixel_stride
        dirs = np.stack([(ix - cx) / fx, (iy - cy) / fy, np.ones_like(d)],
                        axis=-1)
        pts_cam = (dirs * d[..., None]).reshape(-1, 3)
        valid = d.reshape(-1) > 0
        T = traj[j]
        pts = pts_cam[valid] @ T[:3, :3].T + T[:3, 3]
        if store is not None:
            store.insert(pts.astype(np.float32))
        else:
            chunks.append(pts.astype(np.float32))
    if store is not None:
        xyz, _, counts = store.export_points()
        mask = (np.arange(xyz.shape[1])[None, :] < counts[:, None])
        return xyz[mask]
    if not chunks:
        return None
    from proudslam_tpu.mesher import downsample_points
    return downsample_points(np.concatenate(chunks),
                             cell=settings.map.voxel_size * 0.25)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--no-mesh", action="store_true")
    args, extra = parser.parse_known_args()

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()

    from proudslam_tpu.config import load_config, settings_from_config
    from proudslam_tpu.data.registry import get_dataset
    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from proudslam_tpu.utils.logger import RunLogger
    from proudslam_tpu.utils.metrics import ate_rmse

    cfg = load_config(args.config, parse_overrides(extra))
    settings = settings_from_config(cfg)
    dataset = get_dataset(cfg)

    _, rgb0, depth0, K, _ = dataset[0]
    h, w = depth0.shape
    slam = SlamSystem(settings, dataset.intrinsics, (h, w), seed=args.seed)
    logger = RunLogger(cfg.get("log_dir", "./logs"),
                       cfg.get("exp_name", "run"))
    logger.log_config(args.config, cfg.to_dict())

    start = cfg.get("tracker_specs", {}).get("start_frame", 0)
    end = cfg.get("tracker_specs", {}).get("end_frame", -1)
    if end <= 0:
        end = len(dataset)

    if args.resume:
        load_checkpoint(args.resume, slam)
        start = len(slam.frame_poses)
        print(f"resumed at frame {start}")
    else:
        slam.initialize(rgb0, depth0, dataset.get_init_pose(), stamp=start)
        start += 1

    render_freq = cfg.get("debug_args", {}).get("render_freq", 0)
    render_res = cfg.get("debug_args", {}).get("render_res", [200, 160])

    t0 = time.perf_counter()
    skipped = 0
    for i in range(start, end):
        # per-frame fault guard: a corrupt/unreadable frame is skipped and
        # the run continues (reference `tracking.py:76-102`)
        try:
            _, rgb, depth, _, _ = dataset[i]
            slam.validate_frame(rgb, depth)
        except Exception as e:
            skipped += 1
            print(f"frame {i}: skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)
            slam.skip_frame(i)
            continue
        slam.process_frame(i, rgb, depth)
        if i % 25 == 0:
            fps = (i - start + 1) / (time.perf_counter() - t0)
            c = slam.counters(exact=True)
            print(f"frame {i}/{end}  {fps:.2f} fps  "
                  f"voxels={c['num_voxels']}/{c['voxel_capacity']} "
                  f"cells={c['num_cells']}/{c['cell_capacity']} "
                  f"kf={slam.num_kf}")
        if render_freq > 0 and (i + 1) % render_freq == 0:
            # rendered-vs-gt panel (reference `render_debug_images`,
            # tracking.py:161-215)
            from proudslam_tpu.render.preview import render_preview
            import numpy as _np
            from PIL import Image as _Image
            w_r, h_r = render_res
            prgb, pdepth = render_preview(
                slam.map_state, slam.decoder_params, slam.last_pose6,
                settings, w_r, h_r, dataset.intrinsics,
                (depth.shape[1], depth.shape[0]))
            gt_rgb = _np.asarray(_Image.fromarray(
                (_np.asarray(rgb) * 255).astype("uint8")).resize(
                    (w_r, h_r))) / 255.0
            gt_depth = _np.asarray(_Image.fromarray(
                _np.asarray(depth)).resize((w_r, h_r)))
            logger.log_images(i, gt_rgb, gt_depth, prgb, pdepth)

    final_iter = cfg.get("mapper_specs", {}).get("final_iter", 0)
    if final_iter:
        slam.finalize(final_iter)

    # pose-updating global BA + map re-bake (the drift correction that
    # takes bench ATE from ~7 to ~1.5 cm; the reference's final refinement
    # freezes poses, `mapping.py:158-163`, so it cannot do this). Config:
    # mapper_specs.global_refine_rounds / rebake_iterations.
    refine_rounds = cfg.get("mapper_specs", {}).get("global_refine_rounds", 2)
    rebake_iters = cfg.get("mapper_specs", {}).get("rebake_iterations", 0)
    if refine_rounds:
        t_r = time.perf_counter()
        slam.global_refine(rounds=refine_rounds)
        if rebake_iters:
            slam.rebake_map(iterations=rebake_iters)
            slam.global_refine(rounds=1)
        print(f"global refine ({refine_rounds} rounds"
              + (f" + rebake {rebake_iters}" if rebake_iters else "")
              + f"): {time.perf_counter() - t_r:.1f}s")

    traj = slam.get_trajectory()
    logger.log_numpy(traj, "frame_poses")

    gt = getattr(dataset, "gt_pose", None)
    if gt is None and hasattr(dataset, "poses"):
        gt = np.stack(dataset.poses)
    if gt is not None:
        gt = np.asarray(gt).reshape(-1, 4, 4)[:len(traj)]
        ate = ate_rmse(traj, gt, align=False) * 100
        ate_al = ate_rmse(traj, gt, align=True) * 100
        print(f"ATE RMSE: {ate:.3f} cm (aligned {ate_al:.3f} cm)")
        logger.log_metrics(end, {"ate_rmse_cm": ate,
                                 "ate_rmse_aligned_cm": ate_al,
                                 "skipped_frames": skipped})

    save_checkpoint(f"{logger.ckpt_dir}/final_ckpt.npz", slam)

    if not args.no_mesh:
        from proudslam_tpu.mesher import extract_mesh
        depth_points = None
        if cfg.get("mapper_specs", {}).get("mesh_clean", True):
            depth_points = accumulate_depth_cloud(
                dataset, traj, start, settings)
        mesh = extract_mesh(slam.map_state, slam.decoder_params,
                            settings.map, settings.decoder,
                            res=cfg.get("mapper_specs", {}).get("mesh_res", 8),
                            depth_points=depth_points)
        logger.log_mesh(mesh)
        print(f"mesh: {len(mesh.verts)} verts, {len(mesh.faces)} faces"
              + (" (cleaned)" if depth_points is not None else ""))

    print(f"artifacts in {logger.dir}")


if __name__ == "__main__":
    sys.exit(main())
