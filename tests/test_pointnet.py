import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.models.pointnet import (
    aggregate_point_features, init_pointnet, pointnet_apply)


def test_pointnet_shapes():
    params = init_pointnet(jax.random.PRNGKey(0), feature_n=16)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (7, 8, 3))
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (7, 8, 3))
    out = pointnet_apply(params, xyz, rgb)
    assert out.shape == (7, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pointnet_differentiable():
    params = init_pointnet(jax.random.PRNGKey(0), feature_n=8)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 3))
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (4, 8, 3))

    def f(p):
        return jnp.sum(pointnet_apply(p, xyz, rgb))

    g = jax.grad(f)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_aggregate_weights_favor_near_points():
    sample = jnp.zeros((1, 3))
    # account for the reference's half-voxel bias: query = sample + vs/2
    vs = 0.2
    q = 0.5 * vs
    near = jnp.array([[q, q, q]]) + 0.001
    far = jnp.array([[q + 1.0, q, q]])
    pts = jnp.stack([near, far], axis=1).reshape(1, 2, 3)
    feats = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    out = aggregate_point_features(sample, pts, feats, voxel_size=vs)
    assert float(out[0, 0]) > 0.99  # near point dominates


def test_aggregate_matches_manual_softmax():
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(5, 8, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(5, 8, 4)), jnp.float32)
    out = aggregate_point_features(sample, pts, feats, voxel_size=0.2)
    q = np.asarray(sample) + 0.1
    d = np.linalg.norm(q[:, None] - np.asarray(pts), axis=-1)
    e = np.exp(-10 * d - np.max(-10 * d, axis=-1, keepdims=True))
    w = e / e.sum(-1, keepdims=True)
    expect = (w[..., None] * np.asarray(feats)).sum(1)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)
