"""Spatially-sharded map scale-out (`parallel/spatial.py`) on the virtual
8-device CPU mesh: the map/embedding/ray partitioning with explicit
collectives must reproduce the unsharded math exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import (
    DecoderSettings, MapSettings, RenderSettings, SystemSettings)
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.parallel.spatial import make_joint_mesh, make_spatial_ba_step


def setup():
    settings = SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, max_hits=8,
                              max_samples=40),
        map=MapSettings(voxel_size=0.2, num_embeddings=512, embed_dim=16,
                        voxel_capacity=256, frame_voxel_capacity=128),
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


def test_spatial_loss_matches_unsharded_criterion():
    """The psum'd sharded loss == compute_loss on the full batch."""
    import dataclasses

    from proudslam_tpu.geometry import se3
    from proudslam_tpu.render.losses import compute_loss
    from proudslam_tpu.render.renderer import render_rays

    settings, state, params = setup()
    poses, dirs, gt_c, gt_d, noise = make_batch(settings)
    F, N = dirs.shape[:2]
    SJ = settings.render.max_samples - settings.render.max_hits

    mesh = make_joint_mesh(8)
    step = make_spatial_ba_step(mesh, settings)
    _, _, _, loss_sharded = step(state, params, poses, dirs, gt_c, gt_d,
                                 noise)

    s2 = dataclasses.replace(
        settings,
        decoder=dataclasses.replace(settings.decoder, use_fused_mlp=False))
    R = se3.exp_rotation(poses[:, 3:6])
    world_d = jnp.einsum("fnd,fed->fne", dirs, R).reshape(-1, 3)
    world_o = jnp.broadcast_to(poses[:, None, 0:3], (F, N, 3)).reshape(-1, 3)
    outputs = render_rays(world_o, world_d, state, state.embeddings,
                          params, s2.decoder, s2.render,
                          noise.reshape(-1, SJ))
    loss_ref, _ = compute_loss(outputs, gt_c.reshape(-1, 3),
                               gt_d.reshape(-1), s2.loss)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref),
                               rtol=1e-5)


def test_spatial_matches_single_device():
    """8-way map/ray partitioning must not change the update math."""
    settings, state, params = setup()
    poses, dirs, gt_c, gt_d, noise = make_batch(settings)

    step1 = make_spatial_ba_step(make_joint_mesh(1), settings)
    step8 = make_spatial_ba_step(make_joint_mesh(8), settings)
    emb1, dec1, poses1, loss1 = step1(
        state, params, poses, dirs, gt_c, gt_d, noise)
    emb8, dec8, poses8, loss8 = step8(
        state, params, poses, dirs, gt_c, gt_d, noise)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses8),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb8),
                               atol=2e-4)
    for l1, l8 in zip(dec1["layers"], dec8["layers"]):
        np.testing.assert_allclose(np.asarray(l1["w"]), np.asarray(l8["w"]),
                                   atol=2e-4)


def test_spatial_embedding_grads_land_on_owner_shards():
    """Multiple steps keep improving the loss (grad signal is real, not
    zeroed by the shard plumbing)."""
    settings, state, params = setup()
    poses, dirs, gt_c, gt_d, noise = make_batch(settings)
    mesh = make_joint_mesh(8)
    step = make_spatial_ba_step(mesh, settings)

    losses = []
    emb, dec, p = state.embeddings, params, poses
    for _ in range(5):
        emb, dec, p, loss = step(
            state._replace(embeddings=emb), dec, p, dirs, gt_c, gt_d, noise,
            lr=5e-2)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    # embeddings actually moved (the all_gather transpose delivered grads)
    assert not np.allclose(np.asarray(emb), np.asarray(state.embeddings))
