import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.config import LossSettings
from proudslam_tpu.render.losses import _masked_median, compute_loss
from proudslam_tpu.render.renderer import RenderOutputs


def make_outputs(color, depth, sdf, z_vals, weights, sample_mask, hit_mask):
    return RenderOutputs(
        color=jnp.asarray(color, jnp.float32),
        depth=jnp.asarray(depth, jnp.float32),
        sdf=jnp.asarray(sdf, jnp.float32),
        z_vals=jnp.asarray(z_vals, jnp.float32),
        weights=jnp.asarray(weights, jnp.float32),
        sample_mask=jnp.asarray(sample_mask, bool),
        hit_mask=jnp.asarray(hit_mask, bool),
        z_min=jnp.zeros((len(hit_mask),)),
    )


def test_color_loss_hand_computed():
    s = LossSettings(rgb_weight=1.0, depth_weight=0.0, sdf_weight=0.0,
                     fs_weight=0.0)
    out = make_outputs(
        color=[[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]],
        depth=[1.0, 1.0],
        sdf=np.ones((2, 4)), z_vals=np.full((2, 4), 1.0),
        weights=np.zeros((2, 4)), sample_mask=np.ones((2, 4)),
        hit_mask=[True, False])   # second ray excluded
    gt_c = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    gt_d = jnp.asarray([1.0, 1.0])
    loss, aux = compute_loss(out, gt_c, gt_d, s)
    # only ray 0 counts: mean |0.5 - 1.0| = 0.5
    assert float(aux["color_loss"]) == pytest.approx(0.5, abs=1e-6)


def test_depth_loss_ignores_invalid_gt():
    s = LossSettings(rgb_weight=0.0, depth_weight=1.0, sdf_weight=0.0,
                     fs_weight=0.0)
    out = make_outputs(
        color=np.zeros((3, 3)),
        depth=[1.5, 2.0, 7.0],
        sdf=np.ones((3, 4)), z_vals=np.full((3, 4), 1.0),
        weights=np.zeros((3, 4)), sample_mask=np.ones((3, 4)),
        hit_mask=[True, True, True])
    gt_d = jnp.asarray([1.0, 0.0, 100.0])   # rays 1, 2 invalid gt
    gt_c = jnp.zeros((3, 3))
    loss, aux = compute_loss(out, gt_c, gt_d, s)
    assert float(aux["depth_loss"]) == pytest.approx(0.5, abs=1e-6)


def test_fs_and_sdf_losses_signs():
    """Free-space samples push sdf -> 1; near-surface samples push
    z + sdf*T -> depth (reference criterion semantics)."""
    s = LossSettings(rgb_weight=0.0, depth_weight=0.0, sdf_weight=1.0,
                     fs_weight=1.0, truncation=0.1)
    z = np.array([[0.2, 0.5, 0.95, 1.05]])
    sdf = np.array([[0.0, 0.0, 0.0, 0.0]])   # wrong everywhere
    out = make_outputs(
        color=np.zeros((1, 3)), depth=[1.0], sdf=sdf, z_vals=z,
        weights=np.zeros((1, 4)), sample_mask=np.ones((1, 4)),
        hit_mask=[True])
    gt_d = jnp.asarray([1.0])
    loss, aux = compute_loss(out, jnp.zeros((1, 3)), gt_d, s)
    # front samples (z < 0.9): 2 of them, target sdf 1 -> squared err 1 each
    # sdf samples (0.9 <= z <= 1.1): |z + 0 - 1|^2 = (0.05)^2 each
    n_fs, n_sdf = 2.0, 2.0
    fs_w = 1 - n_fs / 4.0
    sdf_w = 1 - n_sdf / 4.0
    denom = 1 * 4  # n_hit * max_len
    np.testing.assert_allclose(float(aux["fs_loss"]),
                               2 * 1.0 / denom * fs_w, atol=1e-6)
    np.testing.assert_allclose(float(aux["sdf_loss"]),
                               2 * 0.05 ** 2 / denom * sdf_w, atol=1e-6)


def test_masked_median():
    x = jnp.asarray([5.0, 1.0, 3.0, 100.0])
    mask = jnp.asarray([True, True, True, False])
    assert float(_masked_median(x, mask)) == 3.0
    mask2 = jnp.asarray([True, True, False, False])
    assert float(_masked_median(x, mask2)) == 1.0  # lower middle


def test_depth_variance_outlier_rejection():
    s = LossSettings(rgb_weight=0.0, depth_weight=1.0, sdf_weight=0.0,
                     fs_weight=0.0)
    n = 8
    depth = np.full((n,), 1.0)
    depth[-1] = 9.0   # wild outlier prediction
    weights = np.zeros((n, 4))
    weights[:, 0] = 1.0
    z = np.tile(np.array([[1.0, 1.1, 1.2, 1.3]]), (n, 1))
    out = make_outputs(
        color=np.zeros((n, 3)), depth=depth,
        sdf=np.ones((n, 4)), z_vals=z, weights=weights,
        sample_mask=np.ones((n, 4)), hit_mask=[True] * n)
    gt_d = jnp.full((n,), 1.0)
    loss_w, aux_w = compute_loss(out, jnp.zeros((n, 3)), gt_d, s,
                                 weight_depth_loss=True)
    loss_nw, aux_nw = compute_loss(out, jnp.zeros((n, 3)), gt_d, s,
                                   weight_depth_loss=False)
    # outlier dominates the unweighted loss; variance weighting rejects it
    assert float(aux_nw["depth_loss"]) == pytest.approx(1.0, abs=1e-6)
    assert float(aux_w["depth_loss"]) < 0.01
