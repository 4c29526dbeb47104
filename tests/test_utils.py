import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.config import Config, load_config
from proudslam_tpu.utils.metrics import ate_rmse, rpe_rmse, umeyama_alignment
from proudslam_tpu.utils.profiler import Profiler


def test_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnested:\n  x: 10\n  y: 20\n")
    leaf = tmp_path / "leaf.yaml"
    leaf.write_text(f"base_config: {base}\na: 2\nnested:\n  y: 99\n")
    cfg = load_config(str(leaf))
    assert cfg.a == 2
    assert cfg.nested == {"x": 10, "y": 99}


def test_config_override():
    cfg = Config({"a": {"b": 1}})
    cfg.override("a.b", 5)
    cfg.override("c.d.e", "v")
    assert cfg.a == {"b": 5}
    assert cfg["c"]["d"]["e"] == "v"


def test_settings_from_config(tmp_path):
    cfg = load_config("configs/replica/room_0.yaml")
    from proudslam_tpu.config import settings_from_config
    s = settings_from_config(cfg)
    assert s.render.step_size == pytest.approx(0.02)  # 0.1 * voxel 0.2
    assert s.map.num_embeddings == 20000
    assert s.tracker.n_rays == 1024
    assert s.mapper.window_size == 4
    assert s.loss.sdf_weight == 5000.0
    hash(s)  # must be hashable (jit static arg)


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    theta = 0.7
    R_true = np.array([[np.cos(theta), -np.sin(theta), 0],
                       [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    t_true = np.array([1.0, -2.0, 0.5])
    dst = src @ R_true.T + t_true
    R, t, s = umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_ate_zero_for_identical():
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 0, 3] = np.arange(10)
    assert ate_rmse(poses, poses) == pytest.approx(0.0, abs=1e-9)
    assert rpe_rmse(poses, poses) == pytest.approx(0.0, abs=1e-9)


def test_ate_known_offset():
    gt = np.tile(np.eye(4), (5, 1, 1))
    est = gt.copy()
    est[:, 2, 3] += 0.1
    assert ate_rmse(est, gt, align=False) == pytest.approx(0.1, abs=1e-6)


def test_profiler_accumulates():
    p = Profiler()
    p.enable()
    p.tick("phase")
    p.tok("phase")
    s = p.summary()
    assert s["phase"]["count"] == 1
    assert s["phase"]["mean_ms"] >= 0


def test_checkpoint_roundtrip(tmp_path):
    from proudslam_tpu.config import (
        DecoderSettings, MapSettings, MapperSettings, RenderSettings,
        SystemSettings, TrackerSettings)
    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    s = SystemSettings(
        render=RenderSettings(max_hits=8, max_samples=40),
        map=MapSettings(num_embeddings=512, voxel_capacity=256,
                        frame_voxel_capacity=64),
        decoder=DecoderSettings(width=32, sdf_dim=16),
        tracker=TrackerSettings(n_rays=32, num_iterations=2),
        mapper=MapperSettings(n_rays_each=32, window_size=2,
                              num_iterations=2, max_keyframes=4,
                              init_iterations=2),
    )
    slam = SlamSystem(s, (50.0, 50.0, 16.0, 12.0), (24, 32), seed=0)
    rgb = np.random.default_rng(0).uniform(size=(24, 32, 3)).astype(np.float32)
    depth = np.full((24, 32), 1.5, np.float32)
    slam.initialize(rgb, depth, np.eye(4), stamp=0)
    slam.process_frame(1, rgb, depth)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, slam)

    slam2 = SlamSystem(s, (50.0, 50.0, 16.0, 12.0), (24, 32), seed=1)
    load_checkpoint(path, slam2)
    assert slam2.num_kf == slam.num_kf
    assert len(slam2.frame_poses) == len(slam.frame_poses)
    np.testing.assert_array_equal(
        np.asarray(slam2.map_state.embeddings),
        np.asarray(slam.map_state.embeddings))
    np.testing.assert_array_equal(
        np.asarray(slam2.store.poses), np.asarray(slam.store.poses))
    # resumed system keeps processing
    slam2.process_frame(2, rgb, depth)
