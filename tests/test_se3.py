import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.geometry import se3


def test_taylor_series_match_closed_form():
    x = jnp.linspace(0.01, 3.0, 50)
    np.testing.assert_allclose(se3.taylor_A(x), jnp.sin(x) / x, atol=1e-4)
    np.testing.assert_allclose(
        se3.taylor_B(x), (1 - jnp.cos(x)) / x**2, atol=1e-4)


def test_taylor_at_zero():
    assert float(se3.taylor_A(jnp.zeros(()))) == pytest.approx(1.0)
    assert float(se3.taylor_B(jnp.zeros(()))) == pytest.approx(0.5)


def test_exp_rotation_is_orthonormal():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (10, 3))
    R = se3.exp_rotation(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    w = 0.5 * jax.random.normal(key, (20, 3))
    w_back = se3.log_rotation(se3.exp_rotation(w))
    np.testing.assert_allclose(w_back, w, atol=1e-3)


def test_matrix_roundtrip_reference_case():
    # the reference's own __main__ check (`se3pose.py:103-113`)
    before = jnp.array([
        [-0.955421, 0.119616, -0.269932, 2.655830],
        [0.295248, 0.388339, -0.872939, 2.981598],
        [0.000408, -0.913720, -0.406343, 1.368648],
        [0.000000, 0.000000, 0.000000, 1.000000]])
    tangent = se3.tangent_from_matrix(before)
    after = se3.matrix_from_tangent(tangent)
    np.testing.assert_allclose(after, before, atol=1e-3)


def test_exp_rotation_differentiable():
    def f(w):
        return jnp.sum(se3.exp_rotation(w))
    g = jax.grad(f)(jnp.array([0.0, 0.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(f)(jnp.array([0.3, -0.2, 0.1]))
    assert np.all(np.isfinite(np.asarray(g2)))
