"""Per-point feature MLP + inverse-distance feature aggregation.

Parity component for the reference's point-feature branch: `PointsResNet`
(`src/variations/resnet.py:142-166` — an MLP 6 -> 64 -> 128 -> 256 -> 512
-> feature_n over concat(xyz, rgb) of the points stored in each voxel) and
the softmax inverse-distance aggregation `get_embeddings_pcd`
(`src/variations/render_helpers.py:209-238`).

In the reference this path is trained but disabled in the live render
(`render_helpers.py:481-484`, SURVEY.md P13/N2); here it is a functional,
tested alternative feature source selectable via
``RenderSettings``-level plumbing (`render/pcd_features.py`). Point data
comes from the native point store (`proudslam_tpu/native.py`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_WIDTHS = (64, 128, 256, 512)


def _linear_init(key, fan_in, fan_out):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound,
                                maxval=bound),
        "b": jax.random.uniform(bkey, (fan_out,), minval=-bound, maxval=bound),
    }


def init_pointnet(key: jax.Array, feature_n: int = 16) -> Params:
    keys = jax.random.split(key, len(_WIDTHS) + 1)
    layers = []
    fan_in = 6
    for i, w in enumerate(_WIDTHS):
        layers.append(_linear_init(keys[i], fan_in, w))
        fan_in = w
    fc = _linear_init(keys[-1], _WIDTHS[-1], feature_n)
    # small head: the decoder downstream is initialized/trained against
    # N(0, 0.01)-scale features (`mapping.py:71-80` embeddings init); a
    # default-init head emits O(1) features that put the SDF decode far
    # off-scale for the whole early optimization
    fc = {"w": fc["w"] * 0.02, "b": fc["b"] * 0.02}
    return {"layers": layers, "fc": fc}


def pointnet_apply(params: Params, xyz: jnp.ndarray,
                   rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., K, 3) xyz + (..., K, 3) rgb -> (..., K, feature_n)."""
    x = jnp.concatenate([xyz, rgb], axis=-1)
    for layer in params["layers"]:
        x = jax.nn.relu(
            jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
            + layer["b"])
    return jnp.dot(x, params["fc"]["w"],
                   preferred_element_type=jnp.float32) + params["fc"]["b"]


def aggregate_point_features(sample_xyz: jnp.ndarray,
                             point_xyz: jnp.ndarray,
                             point_feats: jnp.ndarray,
                             voxel_size: float,
                             sharpness: float = 10.0) -> jnp.ndarray:
    """Softmax inverse-distance blend (reference `get_embeddings_pcd`,
    `render_helpers.py:219-238`, incl. its half-voxel sample bias).

    Args:
      sample_xyz: (N, 3); point_xyz: (N, K, 3); point_feats: (N, K, D).
    Returns:
      (N, D)
    """
    q = sample_xyz + 0.5 * voxel_size
    d = jnp.linalg.norm(q[:, None, :] - point_xyz, axis=-1)   # (N, K)
    w = jax.nn.softmax(-sharpness * d, axis=-1)
    return jnp.sum(w[..., None] * point_feats, axis=-2)
