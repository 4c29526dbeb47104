"""Fused Pallas render forward (interpret mode) vs the XLA oracle.

Runs the FULL `render_rays` both ways — the fused sample-feature+decoder
kernel with its custom VJP, and the pure-XLA path — on the same map and
rays, comparing outputs and the gradients the SLAM loops consume
(embeddings for mapping, ray origins/directions for tracking).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.config import (DecoderSettings, LossSettings,
                                  MapSettings, RenderSettings)
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.ops.pallas import render_kernel as rk
from proudslam_tpu.render.losses import compute_loss
from proudslam_tpu.render.renderer import render_rays


@pytest.fixture
def setup(monkeypatch):
    # force the fused branch on CPU (interpret-mode kernel)
    monkeypatch.setattr(rk, "fused_render_applicable",
                        lambda dec: dec.use_fused_mlp and dec.depth == 2
                        and not dec.skips and dec.embedder == "none")
    rng = np.random.default_rng(0)
    coords = np.unique(rng.integers(-6, 6, (400, 3)), axis=0)
    ms = MapSettings(voxel_size=0.2, num_embeddings=4096, embed_dim=16,
                     voxel_capacity=512, frame_voxel_capacity=64)
    state = vh.build_map_state_numpy(coords, ms)
    rs = RenderSettings(voxel_size=0.2, step_size=0.05, max_hits=6,
                        max_samples=24)
    dec_fused = DecoderSettings(depth=2, width=64, in_dim=16, sdf_dim=64,
                                matmul_dtype="bf16", use_fused_mlp=True)
    dec_xla = dataclasses.replace(dec_fused, use_fused_mlp=False)
    params = init_decoder(jax.random.PRNGKey(1), dec_fused)
    R = 32
    key = jax.random.PRNGKey(2)
    d = jnp.concatenate([0.4 * jax.random.normal(key, (R, 2)),
                         jnp.ones((R, 1))], axis=-1)
    o = jnp.zeros((R, 3)) + jnp.array([0.05, 0.02, -0.1])
    noise = jax.random.uniform(jax.random.PRNGKey(3),
                               (R, rs.max_samples - rs.max_hits))
    return state, rs, dec_fused, dec_xla, params, o, d, noise


def test_forward_matches_xla(setup):
    state, rs, dec_f, dec_x, params, o, d, noise = setup
    out_f = render_rays(o, d, state, state.embeddings, params, dec_f, rs,
                        noise)
    out_x = render_rays(o, d, state, state.embeddings, params, dec_x, rs,
                        noise)
    assert bool(jnp.any(out_x.hit_mask))
    m = np.asarray(out_x.sample_mask)
    np.testing.assert_allclose(np.asarray(out_f.sdf)[m],
                               np.asarray(out_x.sdf)[m],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_f.depth),
                               np.asarray(out_x.depth),
                               rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_f.color),
                               np.asarray(out_x.color),
                               rtol=3e-2, atol=5e-3)


def test_gradients_match_xla(setup):
    state, rs, dec_f, dec_x, params, o, d, noise = setup
    gt_c = jnp.full((o.shape[0], 3), 0.4)
    gt_d = jnp.full((o.shape[0],), 1.2)
    ls = LossSettings()

    def loss(dec_settings):
        def f(emb, o_, d_, p):
            out = render_rays(o_, d_, state, emb, p, dec_settings, rs,
                              noise)
            val, _ = compute_loss(out, gt_c, gt_d, ls)
            return val
        return f

    g_f = jax.grad(loss(dec_f), argnums=(0, 1, 2, 3))(
        state.embeddings, o, d, params)
    g_x = jax.grad(loss(dec_x), argnums=(0, 1, 2, 3))(
        state.embeddings, o, d, params)

    # embeddings (mapping path)
    scale = float(jnp.max(jnp.abs(g_x[0]))) + 1e-12
    assert scale > 0
    np.testing.assert_allclose(np.asarray(g_f[0]) / scale,
                               np.asarray(g_x[0]) / scale,
                               atol=3e-2)
    # ray origin/direction (tracking/pose path)
    for a, b in ((g_f[1], g_x[1]), (g_f[2], g_x[2])):
        s = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=3e-2)
    # decoder params
    flat_f = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_f[3])])
    flat_x = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_x[3])])
    s = float(jnp.max(jnp.abs(flat_x))) + 1e-12
    np.testing.assert_allclose(np.asarray(flat_f) / s,
                               np.asarray(flat_x) / s, atol=3e-2)
