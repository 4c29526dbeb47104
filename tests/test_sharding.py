"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import (
    DecoderSettings, MapSettings, RenderSettings, SystemSettings)
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.parallel.sharded import make_mesh, make_sharded_ba_step


def setup(voxel_capacity=256):
    settings = SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, max_hits=8,
                              max_samples=40),
        map=MapSettings(voxel_size=0.2, num_embeddings=512, embed_dim=16,
                        voxel_capacity=voxel_capacity,
                        frame_voxel_capacity=128),
        decoder=DecoderSettings(width=64, sdf_dim=32),
    )
    key = jax.random.PRNGKey(0)
    state = vh.init_map_state(settings.map, key)
    xs, ys = np.meshgrid(np.arange(-4, 5), np.arange(-4, 5))
    pts = np.stack([xs.ravel() * 0.2 + 0.1, ys.ravel() * 0.2 + 0.1,
                    np.full(xs.size, 1.05)], axis=-1)
    state = vh.insert_points(state, jnp.asarray(pts, jnp.float32),
                             jnp.ones((pts.shape[0],), bool), settings.map)
    params = init_decoder(jax.random.PRNGKey(1), settings.decoder)
    return settings, state, params


def make_batch(settings, F=2, N=64):
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dirs = jnp.concatenate([
        0.3 * jax.random.normal(k1, (F, N, 2)), jnp.ones((F, N, 1))], -1)
    gt_c = jax.random.uniform(k2, (F, N, 3))
    gt_d = 1.0 + 0.1 * jax.random.uniform(k3, (F, N))
    noise = jax.random.uniform(
        k4, (F, N, settings.render.max_samples - settings.render.max_hits))
    poses = jnp.zeros((F, 6))
    return poses, dirs, gt_c, gt_d, noise


def test_mesh_shapes():
    m1 = make_mesh(2)
    assert m1.shape == {"dp": 2, "mp": 1}
    m2 = make_mesh(8)
    assert m2.shape == {"dp": 4, "mp": 2}


def test_sharded_step_runs_and_is_finite():
    settings, state, params = setup()
    mesh = make_mesh(8)
    step = make_sharded_ba_step(mesh, settings)
    poses, dirs, gt_c, gt_d, noise = make_batch(settings)
    with mesh:
        emb, dec, new_poses, loss = step(
            state, params, poses, dirs, gt_c, gt_d, noise)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(emb)).all()


def test_sharded_matches_single_device():
    """dp x mp sharding must not change the math."""
    settings, state, params = setup()
    poses, dirs, gt_c, gt_d, noise = make_batch(settings)

    mesh1 = make_mesh(1, mp=1)
    mesh8 = make_mesh(8)
    step1 = make_sharded_ba_step(mesh1, settings)
    step8 = make_sharded_ba_step(mesh8, settings)
    with mesh1:
        emb1, dec1, poses1, loss1 = step1(
            state, params, poses, dirs, gt_c, gt_d, noise)
    with mesh8:
        emb8, dec8, poses8, loss8 = step8(
            state, params, poses, dirs, gt_c, gt_d, noise)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses8),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb8),
                               atol=2e-4)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
