"""Trilinear gather of vertex embeddings at sample points.

Replaces the reference's double-``F.embedding`` + trilinear interpolation
(`render_helpers.py:46-59, 86-99, 104-156`): for each sample, fetch its
voxel's 8 corner embedding ids, gather rows from the embedding table, and
blend with trilinear weights computed from the sample's fractional position
inside the voxel.

Corner ordering matches the reference (`octree.cpp:11-13` incr tables and
`offset_points`, `render_helpers.py:67-83`): z fastest, x slowest, corner
j's offset bit pattern = (j>>2, (j>>1)&1, j&1).

The production path (:func:`gather_ray_features`) is built around what the
TPU memory system is good and bad at. Gathers are cheap at any row width;
scatters have a per-row cost that makes fine-grained rows ruinous
(measured: 590k x 16-wide scatter-add 10.3 ms, 74k x 128-wide 1.0 ms).
So the embedding fetch is factored into three *gathers*

  corner view   EV[v]   = embeddings[vertex_ids[v]]          (V, 8D)
  per hit slot  rb[r,h] = EV[hit_voxel[r,h]]                 (R, H, 8D)
  per sample    f8[r,s] = rb[r, bin[r,s]]                    (R, S, 8D)

with a custom VJP that transposes each hop at its cheapest granularity:
samples -> hit slots by a cumulative-sum segment reduction (bins are
non-decreasing along a ray), hit slots -> corner view by one 128-wide-row
scatter, and corner view -> embedding rows by a *gather* over the
precomputed inverse vertex map (each embedding row is a corner of at most
8 voxels; `ops/voxel_hash.py` maintains the map at insertion). Autodiff of
the previous one-hot-einsum formulation spent ~18 ms per BA iteration in
the embedding scatter alone; this formulation measures ~2.5 ms for the
entire embedding backward at bench shapes (BENCH_NOTES round 4).
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

_FLOAT0 = jax.dtypes.float0

# Precision of the one-hot selection einsums (f8 expansion + transposes).
# HIGHEST (6-pass f32 on the MXU) reproduces the scatter oracle bitwise;
# the one-hot operand is exactly representable at any precision, so
# DEFAULT only perturbs the rb-value side at bf16 epsilon — measured
# against end-to-end ATE before switching the default (BENCH_NOTES r5).
EINSUM_PREC = jax.lax.Precision.HIGHEST


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


# ---------------------------------------------------------------------------
# sample-level corner-feature fetch with restructured backward
# ---------------------------------------------------------------------------


@jax.custom_vjp
def corner_view(embeddings, vertex_ids, inv_map):
    """(E,D),(V,8),(E,8) -> (V,8D) per-voxel corner-embedding view.

    Loop-invariant whenever embeddings are frozen (tracking) — callers
    hoist it out of their optimizer scans. Custom backward folds the
    (V,8D) cotangent onto embedding rows by a pure *gather* over the
    inverse vertex map (each embedding row is a corner of <= 8 voxels),
    replacing a 164k x 16-wide scatter. ``inv_map`` None falls back to
    the scatter fold (views that lack the map, e.g. spatial shards).
    """
    V = vertex_ids.shape[0]
    return embeddings[vertex_ids.reshape(-1)].reshape(V, -1)


def _corner_view_fwd(embeddings, vertex_ids, inv_map):
    out = corner_view(embeddings, vertex_ids, inv_map)
    return out, (embeddings.shape, vertex_ids, inv_map)


def _corner_view_bwd(res, dEV):
    (E, D), vertex_ids, inv_map = res
    V = vertex_ids.shape[0]
    flat = dEV.reshape(V * 8, D)
    if inv_map is None:
        d_emb = jnp.zeros((E, D), dEV.dtype).at[
            vertex_ids.reshape(-1)].add(flat)
    else:
        # entries referencing voxel slots beyond this (possibly bucketed)
        # view are masked — those rows received no gradient
        ok = (inv_map >= 0) & (inv_map < V * 8)
        rows = flat[jnp.where(ok, inv_map, 0)]           # (E, 8, D)
        d_emb = jnp.sum(jnp.where(ok[..., None], rows, 0.0), axis=1)
    z = lambda a: _np.zeros(a.shape, _FLOAT0)
    d_inv = None if inv_map is None else z(inv_map)
    return (d_emb, z(vertex_ids), d_inv)


corner_view.defvjp(_corner_view_fwd, _corner_view_bwd)


def _f8_impl(EV, vidx, bins):
    # row gather to the (ray, hit-slot) level, then an exact one-hot
    # contraction to samples — measured faster than any flat/batched
    # gather formulation for the (R,S,128) expansion on TPU
    H = vidx.shape[1]
    rb = EV[vidx]                                        # (R, H, 8D)
    onehot = (bins[:, :, None]
              == jnp.arange(H, dtype=bins.dtype)).astype(jnp.float32)
    return jnp.einsum("rsh,rhk->rsk", onehot, rb,
                      precision=EINSUM_PREC)


@jax.custom_vjp
def _gather_f8(EV, vidx, bins):
    """(V,8D),(R,H),(R,S) -> (R,S,8D) corner features per sample.

    ``bins`` entries for invalid samples must be H (matching no hit slot:
    zero features forward, zero cotangent backward).
    """
    return _f8_impl(EV, vidx, bins)


def _gather_f8_fwd(EV, vidx, bins):
    return _f8_impl(EV, vidx, bins), (EV.shape[0], vidx, bins)


def _gather_f8_bwd(res, dout):
    V, vidx, bins = res
    R, S, K = dout.shape
    H = vidx.shape[1]

    # samples -> hit slots: exact one-hot contraction transpose (a prefix
    # -sum segment reduction was measured 5x slower — TPU cumsum over the
    # (R,S,128) cotangent is multiple full-array passes)
    onehot = (bins[:, :, None]
              == jnp.arange(H, dtype=bins.dtype)).astype(jnp.float32)
    d_rb = jnp.einsum("rsh,rsk->rhk", onehot, dout,
                      precision=EINSUM_PREC)  # (R, H, K)

    # hit slots -> corner view: one wide-row scatter (invalid slots were
    # clamped to 0 but receive only zero cotangents — see renderer masks)
    dEV = jnp.zeros((V, K), dout.dtype).at[
        jnp.maximum(vidx, 0).reshape(-1)].add(d_rb.reshape(-1, K))

    z = lambda a: _np.zeros(a.shape, _FLOAT0)
    return (dEV, z(vidx), z(bins))


_gather_f8.defvjp(_gather_f8_fwd, _gather_f8_bwd)


def precompute_f8(EV: jnp.ndarray, vidx: jnp.ndarray,
                  sample_bins: jnp.ndarray, voxel_keys: jnp.ndarray,
                  voxel_size: float):
    """Precompute the per-sample corner features + voxel centers for a
    FROZEN (embeddings, ray batch) pair — loop-invariant across a
    tracking scan (embeddings frozen, fixed sample batch), where only the
    trilinear weights (pose-dependent) change per iteration. Returns
    (f8 (R,S,8,D), center (R,S,3)) for `gather_ray_features(f8_center=)`.
    """
    from proudslam_tpu.ops.voxel_hash import unpack_key

    R, H = vidx.shape
    S = sample_bins.shape[1]
    D = EV.shape[1] // 8
    f8 = _gather_f8(EV, vidx, sample_bins).reshape(R, S, 8, D)
    keys_rb = voxel_keys[vidx]
    centers_rb = (unpack_key(keys_rb).astype(jnp.float32) + 0.5) * voxel_size
    onehot = (sample_bins[:, :, None]
              == jnp.arange(H, dtype=sample_bins.dtype)).astype(jnp.float32)
    center = jnp.einsum("rsh,rhc->rsc", onehot, centers_rb,
                        precision=EINSUM_PREC)
    return f8, center


def gather_ray_features(sampled_xyz: jnp.ndarray,
                        sample_bins: jnp.ndarray,
                        hit_voxel_idx: jnp.ndarray,
                        voxel_keys: jnp.ndarray,
                        voxel_vertex_ids: jnp.ndarray,
                        embeddings: jnp.ndarray,
                        voxel_size: float,
                        inv_map: jnp.ndarray = None,
                        EV: jnp.ndarray = None,
                        f8_center=None) -> jnp.ndarray:
    """Ray-structured variant of :func:`gather_voxel_features`.

    Exploits the render topology: a ray's samples reference at most H
    distinct voxels (its intersection hit slots), and its sample bins are
    non-decreasing in depth order. The corner features reach each sample
    through three row gathers (see module docstring) whose custom VJP
    accumulates embedding gradients at (ray, hit-slot) granularity with
    128-wide rows — the structure TPU scatters need to be fast.

    Args:
      sampled_xyz: (R, S, 3) world positions (differentiable).
      sample_bins: (R, S) int — hit-slot index of each sample,
        non-decreasing per ray; entries for invalid samples must be >= H
        (the renderer passes ``where(valid, bin, H)``).
      hit_voxel_idx: (R, H) voxel slots from the intersection (-1 invalid).
      voxel_keys: (V,) packed int32 grid coords (see ops/voxel_hash) —
        voxel centers are reconstructed from one integer gather + bit
        unpacking, which beats three float row-gathers on TPU.
      voxel_vertex_ids: (V, 8); embeddings: (E, D).
      inv_map: (E, 8) inverse vertex map (``MapState.inv_map``), or None
        to use a scatter-based fold in the backward.
      EV: optional precomputed :func:`corner_view` — pass it when
        embeddings are frozen across an optimizer scan (tracking) so the
        (V,8D) gather is hoisted out of the loop.
    Returns:
      (R, S, D) interpolated features.
    """
    from proudslam_tpu.ops.voxel_hash import unpack_key

    R, S, _ = sampled_xyz.shape
    H = hit_voxel_idx.shape[1]
    vidx = jnp.maximum(hit_voxel_idx, 0)               # (R, H)

    if f8_center is not None:
        # hoisted by the caller (frozen embeddings + fixed batch): only
        # the pose-dependent trilinear weights remain per iteration
        f8, center = f8_center
    else:
        if EV is None:
            EV = corner_view(embeddings, voxel_vertex_ids, inv_map)
        D = embeddings.shape[1]
        f8 = _gather_f8(EV, vidx, sample_bins).reshape(R, S, 8, D)

        keys_rb = voxel_keys[vidx]                     # (R, H) int32
        centers_rb = (unpack_key(keys_rb).astype(jnp.float32)
                      + 0.5) * voxel_size
        onehot = (sample_bins[:, :, None]
                  == jnp.arange(H, dtype=sample_bins.dtype)
                  ).astype(jnp.float32)
        center = jnp.einsum("rsh,rhc->rsc", onehot, centers_rb,
                            precision=EINSUM_PREC)

    p = (sampled_xyz - center) / voxel_size + 0.5      # (R, S, 3)
    w = trilinear_weights(p.reshape(R * S, 3)).reshape(R, S, 8)
    # invalid lanes (bin == H) carry clamped-gather garbage in f8/center;
    # zero their weights so features are exactly 0 there (as the one-hot
    # formulation produced), keeping the MLP inputs benign
    w = jnp.where((sample_bins < H)[:, :, None], w, 0.0)
    return jnp.sum(w[..., None] * f8, axis=-2)


def gather_ray_features_onehot(sampled_xyz: jnp.ndarray,
                               sample_bins: jnp.ndarray,
                               hit_voxel_idx: jnp.ndarray,
                               voxel_keys: jnp.ndarray,
                               voxel_vertex_ids: jnp.ndarray,
                               embeddings: jnp.ndarray,
                               voxel_size: float) -> jnp.ndarray:
    """Correctness oracle: the round-3 one-hot-einsum formulation.

    Mathematically identical to :func:`gather_ray_features` (one-hot
    selection == gather); kept for gradient cross-checks in tests. Its
    autodiff backward is the slow fine-grained scatter.
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

    onehot = (jnp.minimum(sample_bins, H - 1)[:, :, None]
              == jnp.arange(H, dtype=jnp.int32)).astype(jnp.float32)
    f8 = jnp.einsum("rsh,rhk->rsk", onehot, emb_rb,
                    precision=EINSUM_PREC)
    f8 = f8.reshape(R, S, 8, D)
    center = jnp.einsum("rsh,rhc->rsc", onehot, centers_rb,
                        precision=EINSUM_PREC)

    p = (sampled_xyz - center) / voxel_size + 0.5      # (R, S, 3)
    w = trilinear_weights(p.reshape(R * S, 3)).reshape(R, S, 8)
    return jnp.sum(w[..., None] * f8, axis=-2)
