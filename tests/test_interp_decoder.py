import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import DecoderSettings
from proudslam_tpu.models.decoder import decoder_apply, decoder_values, init_decoder
from proudslam_tpu.ops.interp import gather_voxel_features, trilinear_weights


def test_trilinear_weights_sum_to_one():
    p = jax.random.uniform(jax.random.PRNGKey(0), (32, 3))
    w = trilinear_weights(p)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


def test_trilinear_weights_at_corners():
    # at corner (0,0,0): weight 1 on corner 0; at (1,1,1): weight 1 on 7
    w0 = trilinear_weights(jnp.array([[0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(w0[0]),
                               [1, 0, 0, 0, 0, 0, 0, 0], atol=1e-6)
    w7 = trilinear_weights(jnp.array([[1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(w7[0]),
                               [0, 0, 0, 0, 0, 0, 0, 1], atol=1e-6)
    # corner ordering: index 1 = (0,0,1) (z fastest, matches octree incr)
    w1 = trilinear_weights(jnp.array([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(w1[0]),
                               [0, 1, 0, 0, 0, 0, 0, 0], atol=1e-6)


def test_gather_linear_field_is_exact():
    """Trilinear interp reproduces a linear function exactly."""
    voxel_size = 0.2
    centers = jnp.array([[0.1, 0.1, 0.1]])  # voxel [0,0.2)^3
    vertex_ids = jnp.array([[0, 1, 2, 3, 4, 5, 6, 7]])
    # embedding value at corner = linear function f(x,y,z)=x+2y+3z of corner pos
    corner_pos = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                           [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
                          dtype=np.float32) * voxel_size
    vals = (corner_pos[:, 0] + 2 * corner_pos[:, 1] + 3 * corner_pos[:, 2])
    emb = jnp.asarray(vals[:, None], jnp.float32)
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, 0.2, (16, 3)),
                      jnp.float32)
    out = gather_voxel_features(pts, jnp.zeros((16,), jnp.int32), centers,
                                vertex_ids, emb, voxel_size)
    expect = pts[:, 0] + 2 * pts[:, 1] + 3 * pts[:, 2]
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(expect),
                               atol=1e-5)


def test_gather_gradient_flows_to_xyz_and_embeddings():
    voxel_size = 0.2
    centers = jnp.array([[0.1, 0.1, 0.1]])
    vertex_ids = jnp.array([[0, 1, 2, 3, 4, 5, 6, 7]])
    emb = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    pts = jnp.array([[0.05, 0.12, 0.18]])

    def f(pts, emb):
        return jnp.sum(gather_voxel_features(
            pts, jnp.zeros((1,), jnp.int32), centers, vertex_ids, emb,
            voxel_size))

    gp, ge = jax.grad(f, argnums=(0, 1))(pts, emb)
    assert np.isfinite(np.asarray(gp)).all() and np.abs(np.asarray(gp)).sum() > 0
    assert np.isfinite(np.asarray(ge)).all() and np.abs(np.asarray(ge)).sum() > 0


def test_decoder_shapes_and_ranges():
    s = DecoderSettings()
    params = init_decoder(jax.random.PRNGKey(0), s)
    x = jax.random.normal(jax.random.PRNGKey(1), (17, s.in_dim))
    out = decoder_values(params, s, x)
    assert out.shape == (17, 4)
    rgb = np.asarray(out[:, :3])
    assert np.all(rgb >= 0) and np.all(rgb <= 1)  # sigmoid head
    d = decoder_apply(params, s, x)
    assert d["color"].shape == (17, 3) and d["sdf"].shape == (17,)


def test_decoder_with_skips_and_nerf_embedder():
    s = DecoderSettings(depth=4, width=64, in_dim=8, sdf_dim=32,
                       skips=(2,), embedder="nerf", multires=4)
    params = init_decoder(jax.random.PRNGKey(0), s)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    out = decoder_values(params, s, x)
    assert out.shape == (5, 4)
