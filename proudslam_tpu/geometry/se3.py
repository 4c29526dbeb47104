"""SE(3) pose parameterization as an optimizable (t, omega) 6-vector.

Functional JAX re-design of the reference's `OptimizablePose`
(`src/se3pose.py:8-100`): Rodrigues' rotation via Taylor-series
sin(x)/x and (1-cos(x))/x^2 (numerically safe at theta -> 0, and smooth for
autodiff — the reason the reference uses Taylor series rather than
sin/cos directly), plus the matching log map.

A pose is a plain ``jnp.ndarray`` of shape (..., 6): ``[tx, ty, tz, wx, wy, wz]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def taylor_A_sq(x2: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """sin(x)/x as a series in x^2 — smooth through x == 0.

    The series has only even powers, so evaluating it in x^2 sidesteps the
    NaN gradients of both ``x ** 0`` and ``norm`` at the origin (pose
    gradients must be finite at a zero rotation update).
    """
    ans = jnp.zeros_like(x2)
    denom = 1.0
    power = jnp.ones_like(x2)
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
            power = power * x2
        ans = ans + (-1.0) ** i * power / denom
    return ans


def taylor_B_sq(x2: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """(1-cos(x))/x^2 as a series in x^2 — smooth through x == 0."""
    ans = jnp.zeros_like(x2)
    denom = 1.0
    power = jnp.ones_like(x2)
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        if i > 0:
            power = power * x2
        ans = ans + (-1.0) ** i * power / denom
    return ans


def taylor_A(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """Taylor expansion of sin(x)/x (reference `se3pose.py:71-80`)."""
    return taylor_A_sq(x * x, nth)


def taylor_B(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """Taylor expansion of (1-cos(x))/x^2 (reference `se3pose.py:82-90`)."""
    return taylor_B_sq(x * x, nth)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    row0 = jnp.stack([zeros, -w2, w1], axis=-1)
    row1 = jnp.stack([w2, zeros, -w0], axis=-1)
    row2 = jnp.stack([-w1, w0, zeros], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def exp_rotation(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3): R = I + A*[w]x + B*[w]x^2 (reference `se3pose.py:24-32`).

    Evaluated in theta^2 (no norm) so the map is smooth with finite
    gradients at w == 0.
    """
    wx = skew(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    A = taylor_A_sq(theta_sq)
    B = taylor_B_sq(theta_sq)
    return eye + A * wx + B * (wx @ wx)


def log_rotation(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """SO(3) -> so(3) (reference `se3pose.py:38-47`).

    theta is clamped away from the +-1 trace singularities; explodes near
    theta == pi like the reference (documented FIXME there).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.mod(jnp.arccos(cos_theta), jnp.pi)[..., None, None]
    lnR = 1.0 / (2.0 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    w0 = lnR[..., 2, 1]
    w1 = lnR[..., 0, 2]
    w2 = lnR[..., 1, 0]
    return jnp.stack([w0, w1, w2], axis=-1)


def rotation(pose6: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix of a (..., 6) pose vector."""
    return exp_rotation(pose6[..., 3:6])


def translation(pose6: jnp.ndarray) -> jnp.ndarray:
    return pose6[..., 0:3]


def matrix_from_tangent(pose6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 4, 4) homogeneous transform (reference `se3pose.py:18-22`)."""
    R = rotation(pose6)
    t = translation(pose6)
    batch = pose6.shape[:-1]
    Rt = jnp.zeros(batch + (4, 4), dtype=pose6.dtype)
    Rt = Rt.at[..., :3, :3].set(R)
    Rt = Rt.at[..., :3, 3].set(t)
    Rt = Rt.at[..., 3, 3].set(1.0)
    return Rt


def inverse_matrix(Rt: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse: [R t; 0 1]^-1 = [R^T -R^T t; 0 1].

    Exact (no LU factorization, no MXU rounding) and cheaper than
    ``jnp.linalg.inv`` for rigid transforms.
    """
    R = Rt[..., :3, :3]
    t = Rt[..., :3, 3]
    Rinv = jnp.swapaxes(R, -2, -1)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
    out = jnp.zeros_like(Rt)
    out = out.at[..., :3, :3].set(Rinv)
    out = out.at[..., :3, 3].set(tinv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def tangent_from_matrix(Rt: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) (reference `se3pose.py:50-59`)."""
    w = log_rotation(Rt[..., :3, :3])
    t = Rt[..., :3, 3]
    return jnp.concatenate([t, w], axis=-1)
