"""Pinhole camera model: pixel ray grids and depth backprojection.

Replicates the reference's camera conventions (`src/frame.py:42-71`):
ray directions are **unnormalized** ``[(x-cx)/fx, (y-cy)/fy, 1]`` so that the
ray parameter equals camera-plane z depth — volume-rendered "depth" is
directly comparable to the sensor depth map.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_ray_directions(width: int, height: int, fx, fy, cx, cy) -> jnp.ndarray:
    """(H, W, 3) per-pixel camera-frame ray directions (reference `frame.py:42-58`).

    Uses pixel-corner coordinates (ix, iy integer grid) like the reference.
    """
    ix = jnp.arange(width, dtype=jnp.float32)[None, :]
    iy = jnp.arange(height, dtype=jnp.float32)[:, None]
    x = (ix - cx) / fx
    y = (iy - cy) / fy
    dirs = jnp.stack([
        jnp.broadcast_to(x, (height, width)),
        jnp.broadcast_to(y, (height, width)),
        jnp.ones((height, width), dtype=jnp.float32),
    ], axis=-1)
    return dirs


def scaled_intrinsics(K, w_from: int, h_from: int, w_to: int, h_to: int):
    """Scale (fx, fy, cx, cy) for a resized image (reference `frame.py:46-51`)."""
    fx, fy, cx, cy = K
    sx = w_to / w_from
    sy = h_to / h_from
    return fx * sx, fy * sy, cx * sx, cy * sy


def backproject(rays_d: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame point map (H, W, 3) = rays * depth (reference `frame.py:67-71`)."""
    return rays_d * depth[..., None]


def transform_points(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to (..., 3) points: p @ R^T + t.

    Matches the reference convention `points @ pose[:3,:3].T + pose[:3,3]`
    (`mapping.py:263`).
    """
    return points @ jnp.swapaxes(R, -1, -2) + t


def rotate_dirs(dirs: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """World-frame ray directions: d @ R^T (reference `render_helpers.py:629-631,714-715`)."""
    return dirs @ jnp.swapaxes(R, -1, -2)
