import numpy as np
import pytest

from proudslam_tpu.native import PointStore, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native pointstore not built")


def test_insert_and_count():
    ps = PointStore(0.2, max_voxels=1024, points_per_voxel=4)
    pts = np.array([[0.05, 0.05, 0.05], [0.1, 0.1, 0.1], [0.3, 0.0, 0.0],
                    [-0.1, -0.1, -0.1]], np.float32)
    ps.insert(pts)
    assert ps.num_voxels == 3  # (0,0,0), (1,0,0), (-1,-1,-1)


def test_points_per_voxel_ring():
    ps = PointStore(1.0, max_voxels=16, points_per_voxel=3)
    pts = np.array([[0.1 * i, 0.2, 0.2] for i in range(1, 9)], np.float32)
    ps.insert(pts)
    xyz, rgb, counts = ps.export_points()
    assert ps.num_voxels == 1
    assert counts[0] == 3  # ring capped at 3, oldest replaced


def test_knn_returns_nearest():
    ps = PointStore(0.5, max_voxels=256, points_per_voxel=8)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    ps.insert(pts, rgb=np.ones_like(pts))
    q = np.array([[0.0, 0.0, 0.0]], np.float32)
    nn, col, d2 = ps.knn(q, k=5)
    valid = d2[0] >= 0
    assert valid.sum() >= 1
    # cross-check against brute force restricted to the 3^3 neighborhood
    vox = np.floor(pts / 0.5)
    qvox = np.zeros(3)
    near = pts[(np.abs(vox - qvox) <= 1).all(axis=1)]
    bf = np.sort(((near - q) ** 2).sum(-1))[:valid.sum()]
    np.testing.assert_allclose(np.sort(d2[0][valid]), bf, rtol=1e-5)


def test_knn_sorted_by_distance():
    ps = PointStore(0.5, max_voxels=64, points_per_voxel=8)
    pts = np.array([[0.1, 0, 0], [0.2, 0, 0], [0.05, 0, 0]], np.float32)
    ps.insert(pts)
    nn, _, d2 = ps.knn(np.zeros((1, 3), np.float32), k=3)
    valid = d2[0] >= 0
    assert (np.diff(d2[0][valid]) >= 0).all()
    np.testing.assert_allclose(nn[0, 0], [0.05, 0, 0], atol=1e-6)


def test_voxel_centers():
    ps = PointStore(0.2, max_voxels=64, points_per_voxel=4)
    ps.insert(np.array([[0.1, 0.3, 0.5]], np.float32))
    centers = ps.voxel_centers()
    np.testing.assert_allclose(centers[0], [0.1, 0.3, 0.5], atol=1e-6)


def test_capacity_overflow_drops():
    ps = PointStore(0.1, max_voxels=4, points_per_voxel=2)
    rng = np.random.default_rng(1)
    ps.insert(rng.uniform(-5, 5, size=(500, 3)).astype(np.float32))
    assert ps.num_voxels <= 4
    assert ps.num_dropped > 0
