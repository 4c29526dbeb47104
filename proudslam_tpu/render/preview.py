"""Full-image debug rendering (reference `Tracking.render_debug_images`,
`src/tracking.py:161-215`): render depth + color for every pixel of a
(possibly downscaled) view against the current map, for logging panels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import SystemSettings
from proudslam_tpu.geometry import camera, se3
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.render.renderer import render_rays


def render_preview(map_state: vh.MapState, decoder_params,
                   pose6: jnp.ndarray, settings: SystemSettings,
                   width: int, height: int,
                   intrinsics: Tuple[float, float, float, float],
                   full_wh: Tuple[int, int],
                   chunk: int = 4096, seed: int = 0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (rgb (H, W, 3), depth (H, W)) numpy images.

    Intrinsics are rescaled from the full capture resolution like the
    reference (`frame.py:46-51`); misses render as zeros (reference
    ``fill_in`` with 0, `tracking.py:203-208`).
    """
    fx, fy, cx, cy = camera.scaled_intrinsics(
        intrinsics, full_wh[0], full_wh[1], width, height)
    dirs = camera.pixel_ray_directions(width, height, fx, fy, cx, cy)
    dirs_flat = np.asarray(dirs).reshape(-1, 3)

    rs = settings.render
    SJ = rs.max_samples - rs.max_hits

    @jax.jit
    def render_chunk(state, dec_params, pose6, d, noise):
        R = se3.exp_rotation(pose6[3:6])
        world_d = d @ R.T
        world_o = jnp.broadcast_to(pose6[0:3], world_d.shape)
        out = render_rays(
            world_o, world_d, state, state.embeddings,
            dec_params, settings.decoder, rs, noise)
        hit = out.hit_mask
        return (jnp.where(hit[:, None], out.color, 0.0),
                jnp.where(hit, out.depth, 0.0))

    key = jax.random.PRNGKey(seed)
    n = dirs_flat.shape[0]
    rgb_out = np.zeros((n, 3), np.float32)
    depth_out = np.zeros((n,), np.float32)
    pad_to = -(-n // chunk) * chunk
    for i in range(0, pad_to, chunk):
        d = dirs_flat[i:i + chunk]
        m = d.shape[0]
        if m < chunk:
            d = np.concatenate([d, np.zeros((chunk - m, 3), np.float32)])
        key, k = jax.random.split(key)
        noise = jax.random.uniform(k, (chunk, SJ))
        c, z = render_chunk(map_state, decoder_params, pose6,
                            jnp.asarray(d), noise)
        rgb_out[i:i + m] = np.asarray(c)[:m]
        depth_out[i:i + m] = np.asarray(z)[:m]
    return (rgb_out.reshape(height, width, 3),
            depth_out.reshape(height, width))
