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

import jax
import jax.numpy as jnp

# (8, 3) float corner bits, same order as voxel_hash.CORNER_OFFSETS.
# numpy (not jnp): module-level device constants trigger D2H fetches at
# jit-lowering time through the remote-TPU tunnel.
import numpy as _np

CORNER_BITS = _np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=_np.float32)


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


def gather_ray_features(sampled_xyz: jnp.ndarray,
                        sample_bins: jnp.ndarray,
                        hit_voxel_idx: jnp.ndarray,
                        voxel_keys: jnp.ndarray,
                        voxel_vertex_ids: jnp.ndarray,
                        embeddings: jnp.ndarray,
                        voxel_size: float) -> jnp.ndarray:
    """Ray-structured variant of :func:`gather_voxel_features`.

    Exploits the render topology: a ray's samples reference at most H
    distinct voxels (its intersection hit slots). Corner ids / embeddings /
    centers are gathered **per (ray, hit-slot)** — R*H*8 rows instead of
    R*S*8 — and broadcast to samples with a one-hot contraction over the
    small H axis. Autodiff of the contraction then accumulates embedding
    gradients per hit slot, shrinking the backward scatter-add by S/H (~4x),
    which profiling shows is the dominant mapping-step cost on TPU.

    Args:
      sampled_xyz: (R, S, 3) world positions (differentiable).
      sample_bins: (R, S) int — hit-slot index of each sample.
      hit_voxel_idx: (R, H) voxel slots from the intersection (-1 invalid).
      voxel_keys: (V,) packed int32 grid coords (see ops/voxel_hash) —
        voxel centers are reconstructed from one integer gather + bit
        unpacking, which beats three float row-gathers on TPU.
      voxel_vertex_ids: (V, 8); embeddings: (E, D).
    Returns:
      (R, S, D) interpolated features.
    """
    from proudslam_tpu.ops.voxel_hash import unpack_key

    R, S, _ = sampled_xyz.shape
    H = hit_voxel_idx.shape[1]
    D = embeddings.shape[1]
    vidx = jnp.maximum(hit_voxel_idx, 0)               # (R, H)
    cids = voxel_vertex_ids[vidx]                      # (R, H, 8)
    emb_rb = embeddings[cids].reshape(R, H, 8 * D)     # (R, H, 8D)
    keys_rb = voxel_keys[vidx]                         # (R, H) int32
    centers_rb = (unpack_key(keys_rb).astype(jnp.float32) + 0.5) * voxel_size

    onehot = (sample_bins[:, :, None]
              == jnp.arange(H, dtype=jnp.int32)).astype(jnp.float32)
    # one-hot weights are exact; 'highest' keeps f32 mantissa on the MXU
    f8 = jnp.einsum("rsh,rhk->rsk", onehot, emb_rb,
                    precision=jax.lax.Precision.HIGHEST)
    f8 = f8.reshape(R, S, 8, D)
    center = jnp.einsum("rsh,rhc->rsc", onehot, centers_rb,
                        precision=jax.lax.Precision.HIGHEST)

    p = (sampled_xyz - center) / voxel_size + 0.5      # (R, S, 3)
    w = trilinear_weights(p.reshape(R * S, 3)).reshape(R, S, 8)
    return jnp.sum(w[..., None] * f8, axis=-2)
