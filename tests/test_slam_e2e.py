"""End-to-end SLAM on a synthetic RGB-D sequence (CPU-runnable).

Plays the role of BASELINE.json config 1 (small clip, small capacities):
track+map a short trajectory through an analytic scene and check the
estimated trajectory against ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.config import (
    DecoderSettings, LossSettings, MapSettings, MapperSettings,
    RenderSettings, SystemSettings, TrackerSettings)
from proudslam_tpu.data.synthetic import SyntheticDataset
from proudslam_tpu.engine.slam import SlamSystem
from proudslam_tpu.utils.metrics import ate_rmse


def small_settings() -> SystemSettings:
    return SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, truncation=0.1,
                              max_distance=10.0, max_hits=12, max_samples=72),
        map=MapSettings(voxel_size=0.2, num_embeddings=8192, embed_dim=16,
                        voxel_capacity=4096, frame_voxel_capacity=1024),
        decoder=DecoderSettings(depth=2, width=64, in_dim=16, sdf_dim=64),
        tracker=TrackerSettings(n_rays=256, num_iterations=30,
                                learning_rate=0.01),
        mapper=MapperSettings(n_rays_each=256, window_size=2,
                              num_iterations=5, keyframe_gap=8,
                              max_keyframes=16, init_iterations=60),
        loss=LossSettings(),
    )


@pytest.fixture(scope="module")
def dataset():
    return SyntheticDataset(num_frames=12, width=64, height=48)


def test_synthetic_dataset_sane(dataset):
    _, rgb, depth, K, pose = dataset[0]
    assert rgb.shape == (48, 64, 3)
    assert depth.shape == (48, 64)
    assert (depth > 0).mean() > 0.9          # camera inside the room
    assert depth[depth > 0].min() > 0.2
    assert depth.max() < 6.0                  # room is ~4 m across
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0


def test_slam_end_to_end(dataset):
    s = small_settings()
    slam = SlamSystem(s, dataset.intrinsics, (dataset.height, dataset.width),
                      seed=0)
    _, rgb, depth, _, pose0 = dataset[0]
    slam.initialize(rgb, depth, pose0, stamp=0)
    assert int(slam.map_state.num_voxels) > 50

    for i in range(1, len(dataset)):
        _, rgb, depth, _, _ = dataset[i]
        slam.process_frame(i, rgb, depth)

    est = slam.get_trajectory()
    gt = np.stack(dataset.poses)
    assert est.shape == (len(dataset), 4, 4)

    ate = ate_rmse(est, gt, align=False)
    # motion between frames is ~7 cm; tracking must do much better
    assert ate < 0.05, f"ATE {ate*100:.2f} cm"

    # at least one extra keyframe committed (gap rule fires at stamp > 8)
    assert slam.num_kf >= 2

    # full-pipeline mesh extraction from the trained map
    from proudslam_tpu.mesher import extract_mesh
    mesh = extract_mesh(slam.map_state, slam.decoder_params, s.map,
                        s.decoder, res=6, require_color=True)
    assert len(mesh.verts) > 200
    assert len(mesh.faces) > 200
    assert mesh.colors is not None and len(mesh.colors) == len(mesh.verts)
    # the room geometry: mesh vertices must lie inside the synthetic room
    assert np.abs(mesh.verts).max() < 3.0
    # surface accuracy: mesh vertices near the true scene surface
    d = np.abs(dataset.scene.sdf(mesh.verts.astype(np.float64)))
    assert np.median(d) < 0.05, f"median surface dist {np.median(d):.3f}"

    # --- mesh cleaning against the observed depth cloud ------------------
    # (reference `mesh_util.py:90-102`; wired via run_slam's
    # accumulate_depth_cloud). Observed cloud = backprojected gt depth of a
    # few frames; faces whose vertices are all far from any observation
    # (hallucinated/unseen regions) must be removed.
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), _os.pardir,
                                      "scripts"))
    from run_slam import accumulate_depth_cloud
    cloud = accumulate_depth_cloud(dataset, est, 0, s, max_frames=6,
                                   pixel_stride=2)
    assert cloud is not None and len(cloud) > 500
    clean = extract_mesh(slam.map_state, slam.decoder_params, s.map,
                         s.decoder, res=6, depth_points=cloud,
                         require_color=False)
    assert len(clean.faces) <= len(mesh.faces)
    # postcondition: every kept face has a vertex near the observed cloud
    from scipy.spatial import cKDTree
    tree = cKDTree(cloud)
    radius = s.map.voxel_size * 0.5
    dist, _ = tree.query(clean.verts)
    near = dist <= radius
    assert near[clean.faces].any(axis=-1).all()
    # and cleaning actually removes something: vertices exist that are far
    # from the cloud in the raw mesh (unobserved wall sections)
    dist_raw, _ = tree.query(mesh.verts)
    if (dist_raw > radius).any():
        assert len(clean.faces) < len(mesh.faces)


def test_global_refine_and_rebake(dataset):
    """Pose-updating global BA + map re-bake after a short run.

    Regression for ADVICE r4 #1: with num_kf <= window_size the old window
    clamp went negative and the sweep silently no-oped — rebake_map had
    already reset the embeddings, destroying the trained map. Now windows
    cover slots 0..num_kf and both passes must leave (or improve) the
    trajectory and a reconstructable map.
    """
    s = small_settings()
    slam = SlamSystem(s, dataset.intrinsics, (dataset.height, dataset.width),
                      seed=1)
    _, rgb, depth, _, pose0 = dataset[0]
    slam.initialize(rgb, depth, pose0, stamp=0)
    for i in range(1, 11):
        _, rgb, depth, _, _ = dataset[i]
        slam.process_frame(i, rgb, depth)
    assert 2 <= slam.num_kf <= s.mapper.window_size  # the buggy regime

    gt = np.stack(dataset.poses)[:11]
    ate0 = ate_rmse(slam.get_trajectory(), gt, align=False)
    poses_before = np.asarray(slam.store.poses)

    slam.global_refine(rounds=1)
    poses_after = np.asarray(slam.store.poses)
    # the sweep must actually run: non-anchor keyframe poses move
    assert not np.allclose(poses_before[1:slam.num_kf + 1],
                           poses_after[1:slam.num_kf + 1])
    ate1 = ate_rmse(slam.get_trajectory(), gt, align=False)
    assert ate1 < max(1.5 * ate0, 0.05), f"refine hurt: {ate0}->{ate1}"

    # rebake must retrain (not destroy) the map: the decoded surface stays
    # accurate after embeddings were reset and re-optimized
    slam.rebake_map(iterations=30)
    from proudslam_tpu.mesher import extract_mesh
    mesh = extract_mesh(slam.map_state, slam.decoder_params, s.map,
                        s.decoder, res=6, require_color=False)
    assert len(mesh.verts) > 200
    d = np.abs(dataset.scene.sdf(mesh.verts.astype(np.float64)))
    assert np.median(d) < 0.08, f"median surface dist {np.median(d):.3f}"


def test_fresh_window_threshold_tracks_insert_history(dataset):
    """The scale-free freshness threshold must equal the device voxel
    count from fresh_window_frames inserts ago (zero until enough
    history), and the engine must run normally with the mode enabled."""
    import dataclasses
    import jax.numpy as jnp

    s = small_settings()
    s = dataclasses.replace(s, render=dataclasses.replace(
        s.render, fresh_window_frames=3))
    slam = SlamSystem(s, dataset.intrinsics, (dataset.height, dataset.width),
                      seed=0)
    _, rgb, depth, _, pose0 = dataset[0]
    slam.initialize(rgb, depth, pose0, stamp=0)
    counts = [int(slam.map_state.num_voxels)]
    assert int(slam._fresh_thresh()) == 0       # not enough history yet
    for i in range(1, 6):
        _, rgb, depth, _, _ = dataset[i]
        slam.process_frame(i, rgb, depth)
        counts.append(int(slam.map_state.num_voxels))
        thresh = int(slam._fresh_thresh())
        if len(slam._nv_hist) > 3:
            # deque holds the last 4 insert counts; [0] is 3 inserts ago
            assert thresh == counts[-4], (i, thresh, counts)
        else:
            assert thresh == 0
    est = slam.get_trajectory()
    assert np.isfinite(est).all()
