"""SDF + color MLP decoder (functional, MXU-friendly).

Re-design of the reference `Decoder` (`src/variations/nrgbd.py:80-146`):
positional embedder (identity / NeRF / Gaussian Fourier), an MLP trunk with
optional skip connections, an SDF head emitting (1 + sdf_dim) values, and a
color head conditioned on [sdf_feature, embedded_input] with sigmoid RGB.

Parameters are a plain pytree (dict of dicts) so they drop straight into
optax and `jax.grad`; all matmuls carry ``preferred_element_type=float32``
so XLA schedules them on the MXU at full accumulation precision even when
activations are cast to bfloat16.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from proudslam_tpu.config import DecoderSettings

Params = Dict[str, Any]


def _linear_init(key, fan_in: int, fan_out: int):
    """Kaiming-uniform like torch.nn.Linear default."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}


def _linear(params, x, dtype=jnp.float32):
    """x @ w + b with f32 accumulation; ``dtype`` is the MXU input dtype.

    bf16 inputs run the MXU at 2x f32 throughput; accumulation stays f32
    via ``preferred_element_type`` and the bias add is f32. Parameters are
    stored (and optimized) in f32 — only the matmul operands are cast.
    """
    out = jnp.dot(x.astype(dtype), params["w"].astype(dtype),
                  preferred_element_type=jnp.float32)
    return out + params["b"]


def embedded_size(settings: DecoderSettings) -> int:
    if settings.embedder == "none":
        return settings.in_dim
    if settings.embedder == "nerf":
        # include_input + sin/cos per frequency (`nrgbd.py:48`)
        return settings.in_dim * (2 * settings.multires + 1)
    if settings.embedder == "gaussian":
        return 93  # reference default mapping_size (`nrgbd.py:16`)
    raise ValueError(f"unknown embedder {settings.embedder!r}")


def embed_input(settings: DecoderSettings, params: Params, x: jnp.ndarray) -> jnp.ndarray:
    if settings.embedder == "none":
        return x
    if settings.embedder == "nerf":
        freqs = 2.0 ** jnp.linspace(
            0.0, settings.multires - 1, settings.multires)
        outs = [x]
        for f in freqs:
            outs.append(jnp.sin(x * f))
            outs.append(jnp.cos(x * f))
        return jnp.concatenate(outs, axis=-1)
    if settings.embedder == "gaussian":
        return jnp.sin(jnp.dot(x, params["gaussian_B"],
                               preferred_element_type=jnp.float32))
    raise ValueError(settings.embedder)


def init_decoder(key: jax.Array, settings: DecoderSettings) -> Params:
    emb = embedded_size(settings)
    width = settings.width
    keys = jax.random.split(key, settings.depth + 4)
    layers = []
    in_dim = emb
    for i in range(settings.depth):
        layers.append(_linear_init(keys[i], in_dim, width))
        in_dim = width + emb if i in settings.skips else width
    params: Params = {
        "layers": layers,
        "sdf_out": _linear_init(keys[-4], width, 1 + settings.sdf_dim),
        "color0": _linear_init(keys[-3], settings.sdf_dim + emb, width),
        "color1": _linear_init(keys[-2], width, 3),
    }
    if settings.embedder == "gaussian":
        params["gaussian_B"] = 25.0 * jax.random.normal(
            keys[-1], (settings.in_dim, 93))
    return params


def decoder_values(params: Params, settings: DecoderSettings,
                   x: jnp.ndarray) -> jnp.ndarray:
    """(N, in_dim) features -> (N, 4) [r, g, b, sdf] (`nrgbd.py:116-135`)."""
    dt = jnp.bfloat16 if settings.matmul_dtype == "bf16" else jnp.float32
    xe = embed_input(settings, params, x)
    h = xe
    for i, layer in enumerate(params["layers"]):
        h = jax.nn.relu(_linear(layer, h, dt))
        if i in settings.skips:
            h = jnp.concatenate([xe, h], axis=-1)
    sdf_out = _linear(params["sdf_out"], h, dt)
    sdf = sdf_out[:, :1]
    sdf_feat = sdf_out[:, 1:]
    hc = jnp.concatenate([sdf_feat, xe], axis=-1)
    rgb = jax.nn.sigmoid(
        _linear(params["color1"], jax.nn.relu(_linear(params["color0"], hc, dt)),
                dt))
    return jnp.concatenate([rgb, sdf], axis=-1)


def decoder_apply(params: Params, settings: DecoderSettings,
                  features: jnp.ndarray):
    """-> dict(color=(N,3), sdf=(N,)) like reference forward (`nrgbd.py:140-146`)."""
    out = decoder_values(params, settings, features)
    return {"color": out[:, :3], "sdf": out[:, 3]}
