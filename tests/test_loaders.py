"""Dataset loader tests over tiny generated fixture directories.

The reference ships no loader tests (SURVEY.md §4); these pin the disk
protocol of each loader — file layout, depth scales, intrinsics handling,
crop/scale options, corrupt-frame behavior — so path or scale regressions
can't ship silently. Fixtures are written with PIL into tmp dirs.
"""

import csv
import os

import numpy as np
import pytest
from PIL import Image

from proudslam_tpu.data.arkit import ARKitDataset
from proudslam_tpu.data.replica import ReplicaDataset
from proudslam_tpu.data.scannet import ScanNetDataset


def _write_rgb(path, w, h, value=128):
    Image.fromarray(
        np.full((h, w, 3), value, np.uint8)).save(path)


def _write_depth16(path, w, h, raw):
    Image.fromarray(np.full((h, w), raw, np.uint16)).save(path)


# ---------------------------------------------------------------------------
# Replica (reference src/dataset/replica.py: results/frame%06d.jpg,
# depth%06d.png at scale 6553.5, traj.txt flattened 4x4 per line)
# ---------------------------------------------------------------------------


@pytest.fixture
def replica_dir(tmp_path):
    root = tmp_path / "room_t"
    (root / "results").mkdir(parents=True)
    for i in range(3):
        _write_rgb(root / "results" / f"frame{i:06d}.jpg", 64, 36)
        _write_depth16(root / "results" / f"depth{i:06d}.png", 64, 36,
                       raw=13107)  # 13107 / 6553.5 = 2.0 m
    poses = np.stack([np.eye(4).reshape(-1) for _ in range(3)])
    poses[1, 3] = 0.5   # frame 1: +0.5 m in x
    np.savetxt(root / "traj.txt", poses)
    return str(root)


def test_replica_loader(replica_dir):
    ds = ReplicaDataset(replica_dir)
    assert len(ds) == 3
    fx, fy, cx, cy = ds.intrinsics
    assert (fx, fy, cx, cy) == (600.0, 600.0, 599.5, 339.5)
    idx, rgb, depth, K, pose = ds[1]
    assert rgb.shape == (36, 64, 3) and rgb.dtype == np.float32
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    assert depth.shape == (36, 64) and depth.dtype == np.float32
    np.testing.assert_allclose(depth, 2.0, atol=1e-4)   # scale 6553.5
    assert pose is None                                  # use_gt=False
    init = ds.get_init_pose()
    np.testing.assert_array_equal(init, np.eye(4))


def test_replica_max_depth_and_gt(replica_dir):
    ds = ReplicaDataset(replica_dir, max_depth=1.5, use_gt=True)
    _, _, depth, _, pose = ds[1]
    assert (depth == 0).all()                  # 2.0 m > max_depth -> invalid
    assert pose[0, 3] == 0.5                   # gt pose row reshaped 4x4


# ---------------------------------------------------------------------------
# ScanNet (reference src/dataset/scannet.py: color/%d.jpg resized 640x480,
# depth/%d.png at scale 1000, pose/%d.txt, intrinsic/intrinsic_depth.txt)
# ---------------------------------------------------------------------------


@pytest.fixture
def scannet_dir(tmp_path):
    root = tmp_path / "scene_t"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (root / sub).mkdir(parents=True)
    for i in range(2):
        _write_rgb(root / "color" / f"{i}.jpg", 320, 240)
        _write_depth16(root / "depth" / f"{i}.png", 640, 480, raw=3000)
        np.savetxt(root / "pose" / f"{i}.txt", np.eye(4))
    K = np.array([[580.0, 0, 320.0, 0], [0, 580.0, 240.0, 0],
                  [0, 0, 1.0, 0], [0, 0, 0, 1.0]])
    np.savetxt(root / "intrinsic" / "intrinsic_depth.txt", K)
    return str(root)


def test_scannet_loader(scannet_dir):
    ds = ScanNetDataset(scannet_dir)
    assert len(ds) == 2
    fx, fy, cx, cy = ds.intrinsics
    assert (fx, cx) == (580.0, 320.0)
    _, rgb, depth, _, pose = ds[0]
    assert rgb.shape == (480, 640, 3)          # jpg resized to 640x480
    assert depth.shape == (480, 640)
    np.testing.assert_allclose(depth, 3.0, atol=1e-4)   # scale 1000
    np.testing.assert_array_equal(ds.get_init_pose(), np.eye(4))


def test_scannet_crop_and_scale(scannet_dir):
    ds = ScanNetDataset(scannet_dir, scale_factor=1, crop=8)
    # intrinsics divided by 2^scale, then principal point shifted by crop
    assert ds.K[0, 0] == 290.0
    assert ds.K[0, 2] == 160.0 - 8
    _, rgb, depth, _, _ = ds[0]
    assert depth.shape == (240 - 16, 320 - 16)
    assert rgb.shape == (240 - 16, 320 - 16, 3)


# ---------------------------------------------------------------------------
# ARKit (reference src/dataset/arkit.py: Frames.csv index, intrinsics /5,
# depth scale 1000 with 65535 -> invalid, resize 256x144, no gt poses)
# ---------------------------------------------------------------------------


@pytest.fixture
def arkit_dir(tmp_path):
    root = tmp_path / "capture_t"
    root.mkdir()
    with open(root / "Frames.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "ts", "fx", "fy", "cx", "cy"])
        for i in range(3):
            w.writerow([f"{i:05d}", i, 800.0, 810.0, 640.0, 360.0])
    for i in range(3):
        _write_rgb(root / f"{i:05d}.jpg", 256, 144)
        # frame 2: all-invalid depth (65535 sentinel)
        raw = 65535 if i == 2 else 1500
        _write_depth16(root / f"{i:05d}.png", 256, 192, raw=raw)
    return str(root)


def test_arkit_loader(arkit_dir):
    ds = ARKitDataset(arkit_dir)
    assert len(ds) == 3                         # <=100 rows: none dropped
    fx, fy, cx, cy = ds.intrinsics
    assert (fx, fy, cx, cy) == (160.0, 162.0, 128.0, 72.0)  # /5
    _, rgb, depth, _, pose = ds[0]
    assert rgb.shape == (144, 256, 3)
    np.testing.assert_allclose(depth, 1.5, atol=1e-4)       # scale 1000
    assert pose is None                          # ARKit has no gt
    np.testing.assert_array_equal(ds.get_init_pose(), np.eye(4))


def test_arkit_rejects_all_zero_depth(arkit_dir):
    ds = ARKitDataset(arkit_dir)
    with pytest.raises(ValueError, match="all-zero depth"):
        ds[2]                                    # 65535 -> invalid -> zero


def test_arkit_transpose(arkit_dir):
    ds = ARKitDataset(arkit_dir, transpose=True)
    _, rgb, depth, _, _ = ds[0]
    assert rgb.shape == (256, 144, 3)
    assert depth.shape == (256, 192)             # depth resolution transposed


# ---------------------------------------------------------------------------
# frame validation (SlamSystem.validate_frame) — the per-frame fault guard
# ---------------------------------------------------------------------------


def test_validate_frame_guards():
    from proudslam_tpu.engine.slam import SlamSystem
    rgb = np.zeros((4, 4, 3), np.float32)
    depth = np.ones((4, 4), np.float32)
    SlamSystem.validate_frame(rgb, depth)        # clean frame passes
    with pytest.raises(ValueError, match="all-zero"):
        SlamSystem.validate_frame(rgb, np.zeros((4, 4), np.float32))
    bad = depth.copy()
    bad[0, 0] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        SlamSystem.validate_frame(rgb, bad)
    bad_rgb = rgb.copy()
    bad_rgb[0, 0, 0] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        SlamSystem.validate_frame(bad_rgb, depth)
