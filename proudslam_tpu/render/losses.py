"""Tracking/mapping loss criterion with mask-safe static shapes.

Re-design of `Criterion` (`src/criterion.py:16-116`). The reference
compacts rays by hit mask before computing means; we keep every lane and
reproduce the same *normalization constants* with dynamic scalar divisors:

* color: mean of |err| over hit rays x 3 channels;
* depth: mean over hit rays with valid depth (0.01 < d < max_depth),
  optionally filtered by the rendered depth-variance outlier rule
  (`criterion.py:45-49`);
* free-space + truncated-SDF L2 (`criterion.py:78-116`): masked squared
  errors averaged over (hit rays x max live sample count) — matching the
  reference's `.mean()` over its data-dependent [n_hit, max_len] arrays —
  each scaled by its complementary sample-count weight.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from proudslam_tpu.config import LossSettings
from proudslam_tpu.render.renderer import RenderOutputs


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x[mask] (lower middle, like torch.median)."""
    n = jnp.sum(mask.astype(jnp.int32))
    big = jnp.finfo(x.dtype).max
    xs = jnp.sort(jnp.where(mask, x, big))
    idx = jnp.maximum((n - 1) // 2, 0)
    return xs[idx]


def compute_loss(outputs: RenderOutputs, gt_color: jnp.ndarray,
                 gt_depth: jnp.ndarray, settings: LossSettings,
                 weight_depth_loss: bool = False,
                 ray_weights: jnp.ndarray = None,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted SLAM loss.

    Args:
      gt_color: (R, 3); gt_depth: (R,) for the same ray lanes as outputs.
      ray_weights: optional (R,) in [0, 1] — soft per-ray confidence
        folded into every term's mask AND normalizer (weighted means);
        used by the tracker to discount rays dominated by half-trained
        frontier voxels.
    """
    hitb = outputs.hit_mask.astype(jnp.float32)           # (R,) binary
    wgt = jnp.ones_like(hitb) if ray_weights is None else ray_weights
    hit = hitb * wgt                                      # weighted gate
    n_hit = jnp.maximum(jnp.sum(hit), 1.0)

    # ---- color -----------------------------------------------------------
    color_err = jnp.abs(gt_color - outputs.color) * hit[:, None]
    color_loss = jnp.sum(color_err) / (3.0 * n_hit)

    # ---- depth -----------------------------------------------------------
    valid_depth = (gt_depth > 0.01) & (gt_depth < settings.max_depth)
    valid_depth &= outputs.hit_mask
    depth_err = jnp.abs(gt_depth - outputs.depth)
    if weight_depth_loss:
        # variance of rendered depth distribution (`criterion.py:45-49`)
        zv = jnp.where(outputs.sample_mask, outputs.z_vals, 0.0)
        depth_var = jnp.sum(
            outputs.weights * (outputs.depth[:, None] - zv) ** 2
            * outputs.sample_mask, axis=-1)
        tmp = depth_err / jnp.sqrt(depth_var + 1e-10)
        med = _masked_median(tmp, outputs.hit_mask)
        valid_depth &= tmp < 10.0 * med
    vd = valid_depth.astype(jnp.float32)
    if ray_weights is not None:
        vd = vd * ray_weights
    depth_loss = jnp.sum(depth_err * vd) / jnp.maximum(jnp.sum(vd), 1.0)

    # ---- free-space / truncated SDF (`criterion.py:78-116`) --------------
    # the front/back/sdf region indicators must stay BINARY (fractional
    # ray weights would corrupt the (1-front)(1-back) region logic and
    # leak free-space samples into the sdf term); per-ray weights enter
    # only as multiplicative factors on the squared errors and counts
    z = outputs.z_vals
    sdf = outputs.sdf
    lane = outputs.sample_mask.astype(jnp.float32) * hitb[:, None]
    wl = wgt[:, None]
    d_exp = gt_depth[:, None]
    eps = settings.truncation

    front = jnp.where(z < (d_exp - eps), 1.0, 0.0) * lane
    back = jnp.where(z > (d_exp + eps), 1.0, 0.0) * lane
    depth_ok = jnp.where(
        (d_exp > 0.0) & (d_exp < settings.max_depth), 1.0, 0.0)
    sdf_mask = (1.0 - front) * (1.0 - back) * depth_ok * lane

    num_fs = jnp.sum(front * wl)
    num_sdf = jnp.sum(sdf_mask * wl)
    num_total = jnp.maximum(num_fs + num_sdf, 1.0)
    fs_weight = 1.0 - num_fs / num_total
    sdf_weight = 1.0 - num_sdf / num_total

    # reference divides by n_hit * max_len (mean over its compacted
    # [n_hit, max_len] arrays); max_len = max live samples over hit rays
    max_len = jnp.maximum(
        jnp.max(jnp.sum(outputs.sample_mask, axis=-1)), 1).astype(jnp.float32)
    denom = n_hit * max_len

    fs_loss = jnp.sum(wl * (sdf * front - front) ** 2) / denom * fs_weight
    sdf_loss = jnp.sum(
        wl * ((z + sdf * eps) * sdf_mask
              - d_exp * sdf_mask) ** 2) / denom * sdf_weight

    loss = (settings.rgb_weight * color_loss
            + settings.depth_weight * depth_loss
            + settings.fs_weight * fs_loss
            + settings.sdf_weight * sdf_loss)

    return loss, {
        "loss": loss,
        "color_loss": color_loss,
        "depth_loss": depth_loss,
        "fs_loss": fs_loss,
        "sdf_loss": sdf_loss,
    }
