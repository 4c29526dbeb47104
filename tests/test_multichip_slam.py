"""The REAL SLAM engine on a device mesh: full track+map frames, SPMD.

Unlike `test_sharding.py` / `test_spatial.py` (standalone BA steps on toy
walls), this runs `SlamSystem` itself — the production `track_frame` +
`map_step` + insertion pipeline — over the 8-device CPU mesh with ray
batches sharded over ``dp`` and the embedding table over ``mp``
(`parallel/engine.py`), and asserts the estimated trajectory matches the
single-device run. This is the engine-level scale-out the reference cannot
express at all (its parallelism is two OS processes on one GPU,
`src/voxslam.py:53-74`).
"""

import numpy as np
import pytest

from proudslam_tpu.config import (
    DecoderSettings, LossSettings, MapSettings, MapperSettings,
    RenderSettings, SystemSettings, TrackerSettings)
from proudslam_tpu.data.synthetic import SyntheticDataset
from proudslam_tpu.engine.slam import SlamSystem
from proudslam_tpu.parallel.engine import make_engine_mesh
from proudslam_tpu.utils.metrics import ate_rmse


def engine_settings() -> SystemSettings:
    return SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, truncation=0.1,
                              max_distance=10.0, max_hits=12, max_samples=72),
        map=MapSettings(voxel_size=0.2, num_embeddings=8192, embed_dim=16,
                        voxel_capacity=4096, frame_voxel_capacity=1024),
        decoder=DecoderSettings(depth=2, width=64, in_dim=16, sdf_dim=64),
        tracker=TrackerSettings(n_rays=256, num_iterations=20,
                                learning_rate=0.01),
        mapper=MapperSettings(n_rays_each=256, window_size=2,
                              num_iterations=4, keyframe_gap=4,
                              max_keyframes=16, init_iterations=24),
        loss=LossSettings(),
    )


@pytest.fixture(scope="module")
def dataset():
    return SyntheticDataset(num_frames=6, width=64, height=48)


def run_slam(dataset, mesh):
    s = engine_settings()
    slam = SlamSystem(s, dataset.intrinsics, (dataset.height, dataset.width),
                      seed=0, mesh=mesh)
    _, rgb, depth, _, pose0 = dataset[0]
    slam.initialize(rgb, depth, pose0, stamp=0)
    for i in range(1, len(dataset)):
        _, rgb, depth, _, _ = dataset[i]
        slam.process_frame(i, rgb, depth)
    return slam


def test_full_engine_on_mesh_matches_single_device(dataset):
    mesh = make_engine_mesh(8, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}

    sharded = run_slam(dataset, mesh)
    single = run_slam(dataset, None)

    est_m = sharded.get_trajectory()
    est_1 = single.get_trajectory()
    gt = np.stack(dataset.poses)

    # both runs must be real SLAM (the budget here is cut for test runtime
    # — 20 track iters / 4 map iters; inter-frame motion is ~7 cm)
    ate_m = ate_rmse(est_m, gt, align=False)
    ate_1 = ate_rmse(est_1, gt, align=False)
    assert ate_m < 0.08, f"sharded ATE {ate_m*100:.2f} cm"
    assert ate_1 < 0.08, f"single ATE {ate_1*100:.2f} cm"

    # trajectory equivalence: the SPMD program computes the same math, up
    # to reduction-order float error amplified by ~100 Adam steps
    # (measured: <= 2.7 mm over this clip)
    dt = np.linalg.norm(est_m[:, :3, 3] - est_1[:, :3, 3], axis=-1)
    assert dt.max() < 5e-3, f"max translation divergence {dt.max()*100:.3f} cm"

    # the map states agree too (embeddings trained identically)
    emb_m = np.asarray(sharded.map_state.embeddings)
    emb_1 = np.asarray(single.map_state.embeddings)
    assert np.abs(emb_m - emb_1).max() < 0.1

    # the embedding table is genuinely row-sharded over mp, not replicated
    from jax.sharding import PartitionSpec as P
    assert sharded.map_state.embeddings.sharding.spec in (
        P("mp"), P("mp", None))

    # the sharded run really placed work on all 8 devices
    shards = sharded.map_state.embeddings.sharding
    assert len(shards.device_set) == 8, shards
