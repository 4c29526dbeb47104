"""Schur-complement-structured distributed GN step (`parallel/schur.py`)
on the virtual 8-device CPU mesh: the factorized solve (owner-local 16x16
Cholesky + psum'd pose system) must reproduce a dense joint solve of the
same block-diagonal-H_ww system, and the step must reduce the residual."""

import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import (
    DecoderSettings, MapSettings, RenderSettings, SystemSettings)
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.parallel.schur import (
    dense_gn_reference, make_schur_gn_step)
from proudslam_tpu.parallel.spatial import make_joint_mesh

D = 8  # embedding dim — keeps the dense reference H small


def setup():
    settings = SystemSettings(
        render=RenderSettings(voxel_size=0.2, step_size=0.02, max_hits=8,
                              max_samples=40),
        map=MapSettings(voxel_size=0.2, num_embeddings=256, embed_dim=D,
                        voxel_capacity=256, frame_voxel_capacity=128),
        decoder=DecoderSettings(width=32, sdf_dim=16, in_dim=D),
    )
    key = jax.random.PRNGKey(0)
    state = vh.init_map_state(settings.map, key)
    xs, ys = np.meshgrid(np.arange(-3, 4), np.arange(-3, 4))
    pts = np.stack([xs.ravel() * 0.2 + 0.1, ys.ravel() * 0.2 + 0.1,
                    np.full(xs.size, 1.05)], axis=-1)
    state = vh.insert_points(state, jnp.asarray(pts, jnp.float32),
                             jnp.ones((pts.shape[0],), bool), settings.map)
    # give the embeddings some signal so Jacobians are non-trivial
    state = state._replace(embeddings=0.05 * jax.random.normal(
        jax.random.PRNGKey(7), state.embeddings.shape))
    params = init_decoder(jax.random.PRNGKey(1), settings.decoder)
    return settings, state, params


def make_batch(settings, K=3, N=64):
    key = jax.random.PRNGKey(2)
    k1, k3, k4, k5 = jax.random.split(key, 4)
    dirs = jnp.concatenate([
        0.3 * jax.random.normal(k1, (K, N, 2)), jnp.ones((K, N, 1))], -1)
    gt_d = 1.0 + 0.1 * jax.random.uniform(k3, (K, N))
    noise = jax.random.uniform(
        k4, (K, N, settings.render.max_samples - settings.render.max_hits))
    poses = 0.01 * jax.random.normal(k5, (K, 6))
    anchor = jnp.zeros((K,), bool).at[0].set(True)
    return poses, dirs, gt_d, noise, anchor


def test_schur_matches_dense_reference():
    settings, state, params = setup()
    poses, dirs, gt_d, noise, anchor = make_batch(settings)

    step = make_schur_gn_step(make_joint_mesh(8), settings, damping=1e-3)
    res = step(state, params, poses, dirs, gt_d, noise, anchor)

    d_emb_ref, d_poses_ref, r_ref = dense_gn_reference(
        state, params, poses, dirs, gt_d, noise, settings, anchor,
        damping=1e-3)

    np.testing.assert_allclose(float(res.r_norm), r_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.d_poses), d_poses_ref,
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res.d_emb), d_emb_ref, atol=5e-4)
    # gauge anchor: slot 0 never moves
    assert np.allclose(np.asarray(res.d_poses)[0], 0.0)
    # the step is non-trivial
    assert np.abs(d_poses_ref[1:]).max() > 1e-6
    assert np.abs(d_emb_ref).max() > 1e-6


def test_schur_step_reduces_residual():
    """Descent property on the smooth subproblem (all poses anchored —
    the residual is smooth in the embeddings alone; moving poses re-runs
    intersection, so r(T) is only piecewise smooth and raw descent is not
    guaranteed at any fixed step size)."""
    settings, state, params = setup()
    poses, dirs, gt_d, noise, _ = make_batch(settings)
    anchor = jnp.ones((poses.shape[0],), bool)    # map-only GN
    step = make_schur_gn_step(make_joint_mesh(8), settings, damping=1e-3)

    res = step(state, params, poses, dirs, gt_d, noise, anchor)
    assert np.allclose(np.asarray(res.d_poses), 0.0)
    # damped GN is a descent direction of 0.5||r||^2 (H is PD); a
    # backtracking line search must find an improving step
    r0 = float(res.r_norm)
    best = np.inf
    for alpha in (1.0, 0.5, 0.2, 0.05):
        state2 = state._replace(
            embeddings=state.embeddings + alpha * res.d_emb)
        r2 = float(step(state2, params, poses, dirs, gt_d, noise,
                        anchor).r_norm)
        best = min(best, r2)
        if r2 < r0:
            break
    assert best < r0, (r0, best)


def test_schur_single_vs_eight_devices():
    """The factorization must be mesh-size independent."""
    settings, state, params = setup()
    poses, dirs, gt_d, noise, anchor = make_batch(settings)
    r1 = make_schur_gn_step(make_joint_mesh(1), settings)(
        state, params, poses, dirs, gt_d, noise, anchor)
    r8 = make_schur_gn_step(make_joint_mesh(8), settings)(
        state, params, poses, dirs, gt_d, noise, anchor)
    np.testing.assert_allclose(np.asarray(r1.d_poses),
                               np.asarray(r8.d_poses), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1.d_emb),
                               np.asarray(r8.d_emb), atol=2e-4)
