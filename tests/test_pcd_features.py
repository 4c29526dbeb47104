"""Point-feature render branch (reference `render_helpers.py:168-238`).

Covers the per-voxel point store (insertion semantics mirroring the
octree's <= max_num points per leaf / iVox AddPoints), the softmax
inverse-distance PointNet feature blend, the renderer integration behind
``RenderSettings.feature_mode = "pcd"``, and the live engine path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.config import (
    DecoderSettings, LossSettings, MapSettings, MapperSettings,
    RenderSettings, SystemSettings, TrackerSettings)
from proudslam_tpu.models.pointnet import init_pointnet, pointnet_apply
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.render.pcd_features import (
    gather_pcd_features, init_point_store, insert_frame_points)


def small_map_settings(**kw):
    return MapSettings(voxel_size=0.2, num_embeddings=512, embed_dim=16,
                       voxel_capacity=64, frame_voxel_capacity=32, **kw)


@pytest.fixture(scope="module")
def two_voxel_map():
    ms = small_map_settings()
    coords = np.array([[0, 0, 0], [1, 0, 0]])
    state = vh.build_map_state_numpy(coords, ms)
    return ms, state


def test_insert_counts_and_positions(two_voxel_map):
    ms, state = two_voxel_map
    store = init_point_store(ms, points_per_voxel=4)
    # 3 points in voxel (0,0,0), 1 point in voxel (1,0,0), 1 outside map
    pts = jnp.asarray([[0.05, 0.05, 0.05], [0.15, 0.1, 0.1],
                       [0.02, 0.18, 0.02], [0.25, 0.05, 0.05],
                       [5.0, 5.0, 5.0]], jnp.float32)
    cols = jnp.arange(15, dtype=jnp.float32).reshape(5, 3) / 15.0
    valid = jnp.ones((5,), bool)
    store = insert_frame_points(store, state, pts, cols, valid, ms)

    v0 = vh.lookup_voxel_slots(state, vh.pack_coords(
        jnp.asarray([[0, 0, 0], [1, 0, 0]], jnp.int32)))
    s0, s1 = int(v0[0]), int(v0[1])
    counts = np.asarray(store.counts)
    assert counts[s0] == 3 and counts[s1] == 1
    assert counts.sum() == 4  # the far point was dropped
    got = np.sort(np.asarray(store.xyz[s0, :3]), axis=0)
    want = np.sort(np.asarray(pts[:3]), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_insert_respects_capacity(two_voxel_map):
    ms, state = two_voxel_map
    store = init_point_store(ms, points_per_voxel=4)
    # 10 points all in voxel (0,0,0) — only the first 4 kept (first-come,
    # reference max_num semantics `octree.cpp:175`)
    pts = jnp.asarray(np.full((10, 3), 0.1) +
                      0.005 * np.arange(10)[:, None], jnp.float32)
    cols = jnp.zeros((10, 3))
    store = insert_frame_points(store, state, pts, cols,
                                jnp.ones((10,), bool), ms)
    v0 = int(vh.lookup_voxel_slots(state, vh.pack_coords(
        jnp.asarray([[0, 0, 0]], jnp.int32)))[0])
    assert int(store.counts[v0]) == 4
    np.testing.assert_allclose(np.asarray(store.xyz[v0]),
                               np.asarray(pts[:4]), atol=1e-6)
    # second frame: voxel already full, everything dropped
    store2 = insert_frame_points(store, state, pts, cols,
                                 jnp.ones((10,), bool), ms)
    assert int(store2.counts[v0]) == 4


def test_gather_concentrates_on_nearest_point(two_voxel_map):
    ms, state = two_voxel_map
    store = init_point_store(ms, points_per_voxel=4)
    pts = jnp.asarray([[0.05, 0.05, 0.05], [0.15, 0.15, 0.15]], jnp.float32)
    cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    store = insert_frame_points(store, state, pts, cols,
                                jnp.ones((2,), bool), ms)
    v0 = int(vh.lookup_voxel_slots(state, vh.pack_coords(
        jnp.asarray([[0, 0, 0]], jnp.int32)))[0])

    params = init_pointnet(jax.random.PRNGKey(0), 16)
    # one ray, one sample exactly at the first stored point (minus the
    # half-voxel bias the reference adds to the query)
    sample = (pts[0] - 0.5 * ms.voxel_size)[None, None, :]
    bins = jnp.zeros((1, 1), jnp.int32)
    hits = jnp.asarray([[v0]], jnp.int32)
    out = gather_pcd_features(sample, bins, hits, store, params,
                              ms.voxel_size, sharpness=500.0)
    expect = pointnet_apply(params, pts[0][None], cols[0][None])[0]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(expect),
                               rtol=1e-3, atol=1e-3)

    # a voxel with no points yields exactly zero features
    empty_hits = jnp.asarray([[int(vh.lookup_voxel_slots(
        state, vh.pack_coords(jnp.asarray([[1, 0, 0]], jnp.int32)))[0])]],
        jnp.int32)
    out0 = gather_pcd_features(sample, bins, empty_hits, store, params,
                               ms.voxel_size)
    assert np.all(np.asarray(out0) == 0.0)
    # and its gradient is finite (softmax over masked logits)
    g = jax.grad(lambda s: jnp.sum(gather_pcd_features(
        s, bins, empty_hits, store, params, ms.voxel_size)))(sample)
    assert np.isfinite(np.asarray(g)).all()


def test_slam_end_to_end_pcd_mode():
    """The full engine runs with feature_mode='pcd': points accumulate,
    the PointNet is trained by the mapper's joint Adam, and tracking stays
    locked on a short easy clip."""
    from proudslam_tpu.data.synthetic import SyntheticDataset
    from proudslam_tpu.engine.slam import SlamSystem
    from proudslam_tpu.utils.metrics import ate_rmse

    s = SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, truncation=0.1,
                              max_distance=10.0, max_hits=12, max_samples=48,
                              feature_mode="pcd"),
        map=MapSettings(voxel_size=0.2, num_embeddings=8192, embed_dim=16,
                        voxel_capacity=4096, frame_voxel_capacity=1024,
                        points_per_voxel=8),
        decoder=DecoderSettings(depth=2, width=64, in_dim=16, sdf_dim=64),
        tracker=TrackerSettings(n_rays=192, num_iterations=15,
                                learning_rate=0.01),
        mapper=MapperSettings(n_rays_each=192, window_size=2,
                              num_iterations=4, keyframe_gap=6,
                              max_keyframes=16, init_iterations=40),
        loss=LossSettings(),
    )
    ds = SyntheticDataset(num_frames=5, width=48, height=36)
    slam = SlamSystem(s, ds.intrinsics, (ds.height, ds.width), seed=0)
    assert "pointnet" in slam.decoder_params
    pn0 = np.asarray(slam.decoder_params["pointnet"]["fc"]["w"]).copy()
    _, rgb, depth, _, pose0 = ds[0]
    slam.initialize(rgb, depth, pose0, stamp=0)
    for i in range(1, len(ds)):
        _, rgb, depth, _, _ = ds[i]
        slam.process_frame(i, rgb, depth)

    assert int(np.asarray(slam.point_store.counts).sum()) > 500
    # the pointnet was actually optimized
    pn1 = np.asarray(slam.decoder_params["pointnet"]["fc"]["w"])
    assert np.abs(pn1 - pn0).max() > 1e-5

    est = slam.get_trajectory()
    gt = np.stack(ds.poses)
    assert np.isfinite(est).all()
    ate = ate_rmse(est, gt, align=False)
    # Functional bound only: per-voxel point features carry far less
    # sub-voxel spatial signal than trilinear vertex embeddings, so this
    # branch tracks much worse than "vox" — which is presumably exactly
    # why the reference ships it disabled (`render_helpers.py:481-484`).
    # The assert checks the pipeline stays bounded (no divergence/NaN),
    # not production accuracy; the vox branch's cm-class bound lives in
    # test_slam_e2e.py.
    assert ate < 0.6, f"pcd-mode ATE {ate*100:.1f} cm"
