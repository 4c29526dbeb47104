import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.config import (
    DecoderSettings, LossSettings, MapSettings, RenderSettings)
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.render.losses import compute_loss
from proudslam_tpu.render.renderer import render_rays, sdf_to_weights

RSET = RenderSettings(voxel_size=0.2, step_size=0.02, max_hits=8,
                      max_samples=48, max_distance=10.0)
MSET = MapSettings(voxel_size=0.2, num_embeddings=1024, embed_dim=16,
                   voxel_capacity=256, frame_voxel_capacity=64)
DSET = DecoderSettings()
LSET = LossSettings()


@pytest.fixture(scope="module")
def wall_map():
    """A map with a wall of voxels in the z=1 plane."""
    s = MSET
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    xs, ys = np.meshgrid(np.arange(-3, 4), np.arange(-3, 4))
    pts = np.stack([xs.ravel() * 0.2 + 0.1, ys.ravel() * 0.2 + 0.1,
                    np.full(xs.size, 1.05)], axis=-1)
    state = vh.insert_points(state, jnp.asarray(pts, jnp.float32),
                             jnp.ones((pts.shape[0],), bool), s)
    return state


def _render(state, params, rays_o, rays_d, key=0):
    noise = jax.random.uniform(
        jax.random.PRNGKey(key),
        (rays_o.shape[0], RSET.max_samples - RSET.max_hits))
    return render_rays(
        rays_o, rays_d, state, state.embeddings, params, DSET, RSET, noise)


def test_render_shapes_and_hits(wall_map):
    params = init_decoder(jax.random.PRNGKey(1), DSET)
    rays_o = jnp.zeros((4, 3))
    rays_d = jnp.array([[0.0, 0.0, 1.0],     # hits the wall
                        [0.1, -0.1, 1.0],    # hits the wall
                        [0.0, 0.0, -1.0],    # away from the wall
                        [1.0, 0.0, 0.0]])    # parallel, misses
    out = _render(wall_map, params, rays_o, rays_d)
    assert out.color.shape == (4, 3)
    assert out.depth.shape == (4,)
    hits = np.asarray(out.hit_mask)
    assert hits[0] and hits[1]
    assert not hits[2] and not hits[3]
    # samples of the straight ray lie inside the wall slab
    z = np.asarray(out.z_vals[0])[np.asarray(out.sample_mask[0])]
    assert z.min() >= 1.0 - 1e-4 and z.max() <= 1.2 + 1e-4


def test_sdf_to_weights_peak_at_crossing():
    z = jnp.linspace(0.5, 1.5, 32)[None, :]
    sdf = (1.0 - z)  # crossing at z = 1
    valid = jnp.ones_like(z, dtype=bool)
    w, z_min = sdf_to_weights(sdf, z, valid, truncation=0.1)
    w = np.asarray(w[0])
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-3)
    peak_z = float(z[0, w.argmax()])
    assert abs(peak_z - 1.0) < 0.05
    # truncation mask kills weights past the crossing + trunc
    assert w[np.asarray(z[0]) > float(z_min[0]) + 0.1 + 1e-6].sum() == 0


def test_render_gradients_flow(wall_map):
    params = init_decoder(jax.random.PRNGKey(1), DSET)

    def f(origin, emb, params):
        state = wall_map._replace(embeddings=emb)
        rays_o = jnp.broadcast_to(origin, (8, 3))
        rays_d = jnp.concatenate([
            0.1 * jax.random.normal(jax.random.PRNGKey(2), (8, 2)),
            jnp.ones((8, 1))], axis=-1)
        out = _render(state, params, rays_o, rays_d)
        gt_c = jnp.full((8, 3), 0.5)
        gt_d = jnp.full((8,), 1.0)
        loss, _ = compute_loss(out, gt_c, gt_d, LSET)
        return loss

    g_o, g_e, g_p = jax.grad(f, argnums=(0, 1, 2))(
        jnp.zeros((3,)), wall_map.embeddings, params)
    assert np.isfinite(np.asarray(g_o)).all()
    assert np.abs(np.asarray(g_o)).sum() > 0          # pose gradient exists
    assert np.isfinite(np.asarray(g_e)).all()
    assert np.abs(np.asarray(g_e)).sum() > 0          # embedding gradient
    flat = jax.tree.leaves(g_p)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert sum(float(jnp.abs(x).sum()) for x in flat) > 0


def test_render_overfits_wall_depth(wall_map):
    """Optimizing embeddings+decoder on depth/sdf losses drives rendered
    depth to the true wall depth — the renderer's end-to-end sanity check."""
    params = init_decoder(jax.random.PRNGKey(1), DSET)
    state = wall_map
    key = jax.random.PRNGKey(3)

    rays_d = jnp.concatenate([
        0.15 * jax.random.normal(jax.random.PRNGKey(4), (64, 2)),
        jnp.ones((64, 1))], axis=-1)
    rays_o = jnp.zeros((64, 3))
    gt_d = jnp.full((64,), 1.05)          # wall plane at z = 1.05
    gt_c = jnp.full((64, 3), 0.6)

    import optax
    opt = optax.adam(5e-3)
    opt_state = opt.init((state.embeddings, params))

    @jax.jit
    def step(emb, params, opt_state, key):
        def loss_fn(emb, params):
            st = state._replace(embeddings=emb)
            noise = jax.random.uniform(
                key, (64, RSET.max_samples - RSET.max_hits))
            out = render_rays(
                rays_o, rays_d, st, emb, params, DSET, RSET, noise)
            loss, aux = compute_loss(out, gt_c, gt_d, LSET)
            return loss, (aux, out.depth)
        (loss, (aux, depth)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(emb, params)
        updates, opt_state = opt.update(grads, opt_state)
        emb, params = optax.apply_updates((emb, params), updates)
        return emb, params, opt_state, loss, depth

    emb = state.embeddings
    for i in range(150):
        key, k = jax.random.split(key)
        emb, params, opt_state, loss, depth = step(emb, params, opt_state, k)
    depth_err = float(jnp.abs(depth - gt_d).mean())
    assert depth_err < 0.03, f"depth error {depth_err}"
