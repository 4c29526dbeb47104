"""Ray sampling: stratified samples inside intersected voxel segments,
plus the Gumbel top-k pixel sampler.

Replaces the reference's inverse-CDF CUDA kernel
(`sparse_voxels/src/sample_gpu.cu:133-239` via `voxel_helpers.py:288-374,
637-663`) with a vectorized event-merge formulation. The CUDA kernel walks
each ray's sorted voxel segments, drawing samples uniformly in *CDF space*
(segment probability proportional to length -> uniform in accumulated
arc-length), emitting an extra sample at every segment boundary, and
reporting midpoint depths + inter-sample distances. Equivalently:

  events = sort( {(k + u_k) * step_size}  union  {cumulative segment ends} )

mapped back from arc length to depth; each event's depth output is the
midpoint between its position and the previous event's position (reset to
the segment start when crossing into a new segment), with distance = the
gap. That's exactly what we compute below with static shapes and masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from proudslam_tpu.config import RenderSettings
from proudslam_tpu.ops.intersect import Intersections


class RaySamples(NamedTuple):
    """(R, S) per-sample arrays; invalid samples: idx == -1."""

    depth: jnp.ndarray      # midpoint depth (sentinel where invalid)
    dist: jnp.ndarray       # distance to previous sample (0 where invalid)
    voxel_idx: jnp.ndarray  # voxel slot (-1 where invalid)
    bin: jnp.ndarray        # hit-slot index in [0, H) (undefined if invalid)


def sample_rays_in_segments(inter: Intersections, settings: RenderSettings,
                            noise: jnp.ndarray) -> RaySamples:
    """Stratified sampling along intersected segments (sort-free form).

    Semantically identical to :func:`sample_rays_in_segments_sort` (the
    original event-merge formulation, kept as the oracle) but exploits
    that both event lists are *already sorted*: jittered events are an
    increasing progression in arc length, and boundary events are a
    cumsum. The merged order is then a rank-merge (each event's sorted
    position = own index + count of smaller events in the other list —
    small (R, SJ, H) comparison sums) and the sorted layout is produced by
    one batched one-hot contraction on the MXU, replacing the (R, S)
    ``jnp.sort`` that dominated the sampler's cost on TPU.

    Args:
      inter: sorted per-ray intersections, (R, H) arrays.
      noise: (R, S_jitter) uniforms in (0, 1) — jitter per stratified step
        (reference clamps to [0.001, 0.999], `voxel_helpers.py:328`);
        S_jitter == settings.max_samples - settings.max_hits.

    Returns:
      RaySamples with S == settings.max_samples entries per ray, sorted by
      depth, invalid entries trailing.
    """
    H = settings.max_hits
    S = settings.max_samples
    SJ = S - H
    assert noise.shape[-1] == SJ, (noise.shape, SJ)
    step = settings.step_size
    sentinel = settings.max_depth_sentinel
    INF = jnp.float32(jnp.inf)

    valid_bin = inter.voxel_idx >= 0
    seg_len = jnp.where(valid_bin,
                        jnp.maximum(inter.t_far - inter.t_near, 0.0), 0.0)
    cum = jnp.cumsum(seg_len, axis=-1)            # (R, H) segment end arcs
    cum_lo = cum - seg_len
    total = cum[:, -1:]                           # (R, 1)

    # --- jittered events (sorted: (k + u) is increasing in k, u < 1) ---
    k = jnp.arange(SJ, dtype=jnp.float32)[None, :]
    if settings.adaptive_step:
        step_r = jnp.maximum(step, total / SJ)
    else:
        step_r = step
    jit_arc = (k + jnp.clip(noise, 0.001, 0.999)) * step_r       # (R, SJ)
    jit_arc = jnp.where(jit_arc < total, jit_arc, INF)

    # --- boundary events (sorted: cumsum of nonnegative lengths) ---
    bound_valid = valid_bin & (seg_len > 0)
    bnd_arc = jnp.where(bound_valid, cum, INF)                   # (R, H)

    # per-jitter-event bin + attributes: count of segment ends < arc
    below = cum[:, None, :] < jit_arc[:, :, None]                # (R, SJ, H)
    jbin = jnp.sum(below, axis=-1, dtype=jnp.int32)
    jbin = jnp.clip(jbin, 0, H - 1)
    jhot = jbin[:, :, None] == jnp.arange(H, dtype=jnp.int32)    # (R, SJ, H)
    j_tnear = jnp.sum(jnp.where(jhot, inter.t_near[:, None, :], 0.0), -1)
    j_lo = jnp.sum(jnp.where(jhot, cum_lo[:, None, :], 0.0), -1)
    j_idx = jnp.sum(jnp.where(jhot, inter.voxel_idx[:, None, :], 0), -1,
                    dtype=jnp.int32)
    j_valid = (jit_arc < INF) & (j_idx >= 0)
    j_arc_safe = jnp.where(jit_arc < INF, jit_arc, 0.0)
    j_z = j_tnear + (j_arc_safe - j_lo)                          # (R, SJ)

    # previous-event depth for a jitter event: the previous jitter event if
    # it lies in the same bin (no boundary can sit between two same-bin
    # events), else the segment start
    j_zprev = jnp.concatenate([j_z[:, :1], j_z[:, :-1]], axis=1)
    j_prevbin = jnp.concatenate([jbin[:, :1] - 1, jbin[:, :-1]], axis=1)
    j_zlow = jnp.where(j_prevbin == jbin, j_zprev, j_tnear)

    # per-boundary-event attributes: bin h's end, z = t_far[h]; previous
    # event = last jitter event inside bin h if any, else the segment start
    b_z = jnp.where(bound_valid, inter.t_far, 0.0)               # (R, H)
    in_bin = jhot & j_valid[:, :, None]                          # (R, SJ, H)
    b_zmax = jnp.max(jnp.where(in_bin, j_z[:, :, None], -INF), axis=1)
    b_zlow = jnp.where(b_zmax > -INF, b_zmax, inter.t_near)      # (R, H)
    b_valid = bound_valid & (inter.voxel_idx >= 0)

    # payload per event (invalid events already carry their final values)
    j_depth = jnp.where(j_valid, 0.5 * (j_z + j_zlow), sentinel)
    j_dist = jnp.where(j_valid, jnp.maximum(j_z - j_zlow, 0.0), 0.0)
    j_vidx = jnp.where(j_valid, j_idx, -1)
    j_bin = jnp.where(j_valid, jbin, 0)
    b_depth = jnp.where(b_valid, 0.5 * (b_z + b_zlow), sentinel)
    b_dist = jnp.where(b_valid, jnp.maximum(b_z - b_zlow, 0.0), 0.0)
    b_vidx = jnp.where(b_valid, inter.voxel_idx, -1)
    b_bin = jnp.where(b_valid, jnp.arange(H, dtype=jnp.int32)[None, :], 0)

    # rank-merge: stable merge with jitter-before-boundary on ties; inf
    # (invalid) events land behind every finite one, in stable order. The
    # jitter list is sorted (inf only as a suffix) so its self-rank is its
    # index; the boundary list is NOT (a zero-length segment's inf sits
    # between finite cums), so its self-rank is an O(H^2) comparison count.
    j_pos = (jnp.arange(SJ, dtype=jnp.int32)[None, :]
             + jnp.sum(bnd_arc[:, None, :] < jit_arc[:, :, None], -1,
                       dtype=jnp.int32))                         # (R, SJ)
    h_iota = jnp.arange(H, dtype=jnp.int32)
    b_lt = (bnd_arc[:, None, :] < bnd_arc[:, :, None]) | (
        (bnd_arc[:, None, :] == bnd_arc[:, :, None])
        & (h_iota[None, None, :] < h_iota[None, :, None]))       # (R, H, H)
    b_pos = (jnp.sum(b_lt, -1, dtype=jnp.int32)
             + jnp.sum(jit_arc[:, :, None] <= bnd_arc[:, None, :], 1,
                       dtype=jnp.int32))                         # (R, H)

    # scatter payloads to sorted slots via one-hot masked sums (exact fp —
    # each output slot receives exactly one event's value, no MXU rounding)
    s_iota = jnp.arange(S, dtype=jnp.int32)
    j_hot = j_pos[:, :, None] == s_iota                          # (R, SJ, S)
    b_hot = b_pos[:, :, None] == s_iota                          # (R, H, S)
    j_pay = jnp.stack([j_depth, j_dist, j_vidx.astype(jnp.float32),
                       j_bin.astype(jnp.float32)], axis=-1)      # (R, SJ, 4)
    b_pay = jnp.stack([b_depth, b_dist, b_vidx.astype(jnp.float32),
                       b_bin.astype(jnp.float32)], axis=-1)      # (R, H, 4)
    out = (jnp.sum(jnp.where(j_hot[..., None], j_pay[:, :, None, :], 0.0), 1)
           + jnp.sum(jnp.where(b_hot[..., None], b_pay[:, :, None, :], 0.0),
                     1))                                         # (R, S, 4)

    depth = out[..., 0]
    dist = out[..., 1]
    vidx = out[..., 2].astype(jnp.int32)
    bins = out[..., 3].astype(jnp.int32)
    valid = vidx >= 0
    return RaySamples(
        depth=jnp.where(valid, depth, sentinel),
        dist=jnp.where(valid, dist, 0.0),
        voxel_idx=jnp.where(valid, vidx, -1),
        bin=jnp.where(valid, bins, 0),
    )


def sample_rays_in_segments_sort(inter: Intersections,
                                 settings: RenderSettings,
                                 noise: jnp.ndarray) -> RaySamples:
    """Original jnp.sort event-merge formulation (correctness oracle).

    See :func:`sample_rays_in_segments` for the production sort-free form.
    """
    H = settings.max_hits
    S = settings.max_samples
    SJ = S - H
    assert noise.shape[-1] == SJ, (noise.shape, SJ)
    step = settings.step_size
    sentinel = settings.max_depth_sentinel

    valid_bin = inter.voxel_idx >= 0
    seg_len = jnp.where(valid_bin,
                        jnp.maximum(inter.t_far - inter.t_near, 0.0), 0.0)
    cum = jnp.cumsum(seg_len, axis=-1)            # (R, H) segment end arcs
    cum_lo = cum - seg_len
    total = cum[:, -1:]                           # (R, 1)

    # jittered events at arc positions (k + u) * step. With adaptive_step,
    # rays whose intersected arc exceeds the SJ-sample budget use a coarser
    # per-ray step (total/SJ) so the whole extent stays covered instead of
    # being truncated at SJ*step — rays within budget are bit-identical to
    # the fixed-step (reference) behavior. This keeps the static sample cap
    # small: the per-ray sample count distribution has a long tail (median
    # ~12, p99 ~70 at step 0.02) that fixed-step capping would either waste
    # lanes on or truncate.
    k = jnp.arange(SJ, dtype=jnp.float32)[None, :]
    if settings.adaptive_step:
        step_r = jnp.maximum(step, total / SJ)                   # (R, 1)
    else:
        step_r = step
    jitter_arc = (k + jnp.clip(noise, 0.001, 0.999)) * step_r    # (R, SJ)
    jitter_valid = jitter_arc < total
    jitter_arc = jnp.where(jitter_valid, jitter_arc, jnp.inf)

    # boundary events at segment ends (`sample_gpu.cu:185-199` emits a sample
    # whenever the CDF crosses a bin end)
    bound_valid = valid_bin & (seg_len > 0)
    bound_arc = jnp.where(bound_valid, cum, jnp.inf)             # (R, H)

    raw = jnp.concatenate([jitter_arc, bound_arc], axis=-1)      # (R, S)
    # no payload follows the events through the sort — every downstream
    # quantity (bin, depth) is re-derived from the sorted arc values — so a
    # plain value sort suffices (measurably faster than argsort+gather or
    # rank-matrix permutation on TPU).
    arcs = jnp.sort(jnp.where(jnp.isfinite(raw), raw, sentinel), axis=-1)
    event_valid = arcs < sentinel

    # map arc -> bin: count of segment ends strictly below the arc — puts a
    # boundary event (arc == cum[j]) into bin j, jittered events into their
    # enclosing bin (equivalent to searchsorted side='left').
    bins = jnp.sum(cum[:, None, :] < arcs[:, :, None], axis=-1,
                   dtype=jnp.int32)                              # (R, S)
    bins = jnp.clip(bins, 0, H - 1)
    # per-sample bin attributes via a one-hot masked sum over the (small) H
    # axis — pure fused elementwise on the VPU; row gathers are slow on TPU
    onehot = bins[:, :, None] == jnp.arange(H, dtype=jnp.int32)  # (R, S, H)
    bin_tnear = jnp.sum(
        jnp.where(onehot, inter.t_near[:, None, :], 0.0), axis=-1)
    bin_lo = jnp.sum(jnp.where(onehot, cum_lo[:, None, :], 0.0), axis=-1)
    bin_idx = jnp.sum(
        jnp.where(onehot, inter.voxel_idx[:, None, :], 0), axis=-1,
        dtype=jnp.int32)

    safe_arcs = jnp.where(event_valid, arcs, 0.0)
    z = bin_tnear + (safe_arcs - bin_lo)

    # previous event's z, reset to segment start when the bin changes
    z_prev = jnp.concatenate([z[:, :1], z[:, :-1]], axis=-1)
    prev_bins = jnp.concatenate([bins[:, :1] - 1, bins[:, :-1]], axis=-1)
    new_bin = prev_bins != bins
    z_low = jnp.where(new_bin, bin_tnear, z_prev)

    depth = 0.5 * (z + z_low)
    dist = jnp.maximum(z - z_low, 0.0)   # clamp(min=0), voxel_helpers.py:654

    valid = event_valid & (bin_idx >= 0)
    return RaySamples(
        depth=jnp.where(valid, depth, sentinel),
        dist=jnp.where(valid, dist, 0.0),
        voxel_idx=jnp.where(valid, bin_idx, -1),
        bin=jnp.where(valid, bins, 0),
    )


def gumbel_sample_pixels(key: jax.Array, logp: jnp.ndarray, num: int) -> jnp.ndarray:
    """Top-k Gumbel sampling without replacement (reference `sample_util.py:4-20`).

    Selection uses the TPU-fast ``approx_max_k``: the perturbed-key top-k is
    itself a random draw, so approximate recall only negligibly perturbs the
    (already uniform) sampling distribution.

    Args:
      logp: (N,) log-probabilities (uniform over valid pixels in practice).
    Returns:
      (num,) int32 flat pixel indices.
    """
    u = jax.random.uniform(key, logp.shape)
    gumbel = -jnp.log(-jnp.log(u + 1e-7) + 1e-7)
    _, idx = jax.lax.approx_max_k(logp + gumbel, num)
    return idx.astype(jnp.int32)


def sample_frame_pixels(key: jax.Array, valid_mask, num: int,
                        method: str = "gumbel",
                        num_pixels: int = None) -> jnp.ndarray:
    """Sample ``num`` pixel indices from an (H, W) validity mask.

    Reference samples from a uniform mask over all pixels
    (`frame.py:82-85` passes ones_like(depth)); we keep the mask argument so
    invalid (zero-depth) pixels can be excluded when desired.

    ``valid_mask`` may be None with ``num_pixels`` given: the trivial
    (all-ones) mask, sampled by plain ``randint`` — the production call
    sites (reference passes ones_like(depth), `frame.py:82-85`).

    ``method``:
      * "gumbel" — top-k Gumbel without replacement, the reference's exact
        scheme (`sample_util.py:4-20`). Costs a 76k-element ``approx_max_k``
        *per optimizer iteration* on the render hot path.
      * "uniform" — independent uniform draws (with replacement). For the
        all-ones mask both schemes are uniform over pixels; the expected
        number of duplicate pixels in a 1024-of-76800 draw is ~7, which
        merely double-weights those rays in one stochastic loss evaluation.
        ~10x cheaper on TPU. A non-trivial mask is honored by inverting
        the mask-weight CDF (rejection-free).
    """
    if valid_mask is None:
        assert num_pixels is not None
        if method == "uniform":
            return jax.random.randint(key, (num,), 0, num_pixels,
                                      dtype=jnp.int32)
        valid_mask = jnp.ones((num_pixels,))
    flat = valid_mask.reshape(-1).astype(jnp.float32)
    if method == "uniform":
        c = jnp.cumsum(flat)
        u = jax.random.uniform(key, (num,)) * c[-1]
        return jnp.clip(
            jnp.searchsorted(c, u, side="right").astype(jnp.int32),
            0, flat.shape[0] - 1)
    probs = flat / (flat.sum() + 1e-7)
    return gumbel_sample_pixels(key, jnp.log(probs + 1e-7), num)
