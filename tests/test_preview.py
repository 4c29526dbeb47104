import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import (
    DecoderSettings, MapSettings, RenderSettings, SystemSettings)
from proudslam_tpu.geometry import se3
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.render.preview import render_preview

import jax


def test_preview_shapes_and_coverage():
    settings = SystemSettings(
        render=RenderSettings(max_hits=8, max_samples=40),
        map=MapSettings(num_embeddings=2048, voxel_capacity=512,
                        frame_voxel_capacity=128),
        decoder=DecoderSettings(width=32, sdf_dim=16))
    xs, ys = np.meshgrid(np.arange(-5, 6), np.arange(-5, 6))
    coords = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 5)], -1)
    state = vh.build_map_state_numpy(coords, settings.map)
    params = init_decoder(jax.random.PRNGKey(0), settings.decoder)

    pose6 = jnp.zeros((6,))
    rgb, depth = render_preview(
        state, params, pose6, settings, width=32, height=24,
        intrinsics=(30.0, 30.0, 16.0, 12.0), full_wh=(32, 24), chunk=256)
    assert rgb.shape == (24, 32, 3)
    assert depth.shape == (24, 32)
    # wall at z ~ [1.0, 1.2] in front of the camera: center pixels hit
    assert depth[12, 16] > 0.5
    assert np.isfinite(rgb).all() and np.isfinite(depth).all()
