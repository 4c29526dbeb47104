"""Trilinear gather of vertex embeddings at sample points.

Replaces the reference's double-``F.embedding`` + trilinear interpolation
(`render_helpers.py:46-59, 86-99, 104-156`): for each sample, fetch its
voxel's 8 corner embedding ids, gather rows from the embedding table, and
blend with trilinear weights computed from the sample's fractional position
inside the voxel.

Corner ordering matches the reference (`octree.cpp:11-13` incr tables and
`offset_points`, `render_helpers.py:67-83`): z fastest, x slowest, corner
j's offset bit pattern = (j>>2, (j>>1)&1, j&1).
"""

from __future__ import annotations

import jax.numpy as jnp

# (8, 3) float corner bits, same order as voxel_hash.CORNER_OFFSETS
CORNER_BITS = jnp.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=jnp.float32)


def trilinear_weights(p: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) fractional coords in [0,1] -> (N, 8) corner weights.

    weights = prod_axis (p*q + (1-p)(1-q)) with q in {0,1}
    (reference `render_helpers.py:51`).
    """
    q = CORNER_BITS[None, :, :]            # (1, 8, 3)
    pe = p[:, None, :]                     # (N, 1, 3)
    return jnp.prod(pe * q + (1.0 - pe) * (1.0 - q), axis=-1)


def gather_voxel_features(sampled_xyz: jnp.ndarray,
                          sampled_voxel_idx: jnp.ndarray,
                          voxel_centers: jnp.ndarray,
                          voxel_vertex_ids: jnp.ndarray,
                          embeddings: jnp.ndarray,
                          voxel_size: float) -> jnp.ndarray:
    """Interpolated embedding for each sample point.

    Args:
      sampled_xyz: (N, 3) world positions (differentiable w.r.t. pose).
      sampled_voxel_idx: (N,) voxel slots (clamped >= 0; mask invalid
        samples downstream — gathers at slot 0 are harmless).
      voxel_centers: (V, 3).
      voxel_vertex_ids: (V, 8) embedding rows.
      embeddings: (E, D).

    Returns:
      (N, D) interpolated features.
    """
    idx = jnp.maximum(sampled_voxel_idx, 0)
    centers = voxel_centers[idx]                       # (N, 3)
    corner_ids = voxel_vertex_ids[idx]                 # (N, 8)
    corner_feats = embeddings[corner_ids]              # (N, 8, D)
    # fractional position inside the voxel, 0 at -corner, 1 at +corner
    # (reference `render_helpers.py:91`)
    p = (sampled_xyz - centers) / voxel_size + 0.5
    w = trilinear_weights(p)                           # (N, 8)
    return jnp.sum(w[..., None] * corner_feats, axis=-2)
