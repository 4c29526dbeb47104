"""Fused Pallas decoder kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proudslam_tpu.config import DecoderSettings
from proudslam_tpu.models.decoder import decoder_values, init_decoder
from proudslam_tpu.ops.pallas.mlp_kernel import (
    TILE, decoder_values_fused, pack_params, unpack_grads)

SET = DecoderSettings()  # default arch: depth 2, width 128, in 16, sdf 128
# (matmul_dtype="f32": the kernel matches the f32 XLA oracle tightly; the
# production bench config runs matmul_dtype="bf16", tested loosely below)
SET_BF16 = DecoderSettings(matmul_dtype="bf16")


@pytest.fixture(scope="module")
def params():
    return init_decoder(jax.random.PRNGKey(0), SET)


def test_forward_matches_oracle(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (TILE, SET.in_dim))
    ref = decoder_values(params, SET, x)
    out = decoder_values_fused(params, SET, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_padding(params):
    x = jax.random.normal(jax.random.PRNGKey(2), (300, SET.in_dim))
    ref = decoder_values(params, SET, x)
    out = decoder_values_fused(params, SET, x, interpret=True)
    assert out.shape == (300, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_bf16_matches_oracle_loosely(params):
    """bf16 operand cast (production config): bf16 has 8 mantissa bits, so
    five chained matmuls at width 128 bound the relative error around
    2^-8 * sqrt(128) ~ 4%; sigmoid/relu compress it. Assert a 10% envelope
    on the f32 oracle plus agreement with sdf sign (what the renderer's
    zero-crossing logic consumes)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (TILE, SET.in_dim))
    ref = decoder_values(params, SET, x)
    out = decoder_values_fused(params, SET_BF16, x, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.maximum(np.abs(np.asarray(ref)), 0.05)
    assert np.max(err / scale) < 0.10
    sign_agree = np.mean(np.sign(np.asarray(out)[:, 3])
                         == np.sign(np.asarray(ref)[:, 3]))
    assert sign_agree > 0.99


def test_gradients_match_oracle(params):
    x = jax.random.normal(jax.random.PRNGKey(3), (TILE, SET.in_dim))
    tgt = jax.random.uniform(jax.random.PRNGKey(4), (TILE, 4))

    def loss_ref(params, x):
        out = decoder_values(params, SET, x)
        return jnp.mean((out - tgt) ** 2)

    def loss_fused(params, x):
        out = decoder_values_fused(params, SET, x, interpret=True)
        return jnp.mean((out - tgt) ** 2)

    gref_p, gref_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gfus_p, gfus_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gfus_x), np.asarray(gref_x),
                               atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4),
        gref_p, gfus_p)


def test_multi_tile_accumulation(params):
    """Weight grads must accumulate correctly across grid steps."""
    x = jax.random.normal(jax.random.PRNGKey(5), (2 * TILE, SET.in_dim))

    def loss_fused(params):
        out = decoder_values_fused(params, SET, x, interpret=True)
        return jnp.sum(out[:, 3])

    def loss_ref(params):
        out = decoder_values(params, SET, x)
        return jnp.sum(out[:, 3])

    ga = jax.grad(loss_fused)(params)
    gb = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-4)


def test_pack_unpack_roundtrip(params):
    fp = pack_params(params, SET)
    back = unpack_grads(fp, SET)
    for a, b in zip(sorted(map(str, jax.tree.leaves(params))),
                    sorted(map(str, jax.tree.leaves(back)))):
        pass  # structural check below
    ref = decoder_values(params, SET,
                         jnp.zeros((8, SET.in_dim)))
    out = decoder_values(back, SET, jnp.zeros((8, SET.in_dim)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
