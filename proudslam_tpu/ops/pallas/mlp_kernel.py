"""Fused SDF+color decoder MLP as a Pallas TPU kernel (fwd + custom VJP).

The decoder (reference `nrgbd.py:80-146`, config depth=2/width=128/
in_dim=16/sdf_dim=128/no skips/identity embedder) is five small matmuls
over ~0.5M samples per mapping iteration. Under XLA each layer's
activations round-trip through HBM (~250 MB per (N,128) f32 tensor); fused
in Pallas all activations stay in VMEM per sample tile, weights are
VMEM-resident, and the backward recomputes activations instead of saving
them. Weight gradients accumulate across the sample grid in VMEM-resident
outputs (constant index map).

Layout notes:
  * the sdf head's (width, 1+sdf_dim) matrix is permuted so the sdf column
    is LAST ([feat | sdf]) keeping the feature slice lane-aligned;
  * the color head's (sdf_dim + in_dim, width) matrix is split into a
    feature part and an input part, avoiding an in-kernel concat.

Applies only to the default architecture (depth=2, skips=(), embedder
'none'); the generic XLA path (`models/decoder.py`) remains the fallback
and the correctness oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from proudslam_tpu.config import DecoderSettings

TILE = 2048  # samples per grid step


class FusedParams(NamedTuple):
    w1: jnp.ndarray     # (in_dim, width)
    b1: jnp.ndarray     # (1, width)
    w2: jnp.ndarray     # (width, width)
    b2: jnp.ndarray     # (1, width)
    ws: jnp.ndarray     # (width, sdf_dim + 1)  [feat cols | sdf col last]
    bs: jnp.ndarray     # (1, sdf_dim + 1)
    wc_f: jnp.ndarray   # (sdf_dim, width)  color head, feature part
    wc_x: jnp.ndarray   # (in_dim, width)   color head, input part
    bc: jnp.ndarray     # (1, width)
    wo: jnp.ndarray     # (width, 3)
    bo: jnp.ndarray     # (1, 3)


def fused_applicable(settings: DecoderSettings) -> bool:
    """True when the fused kernel supports the architecture and the default
    backend is a real TPU (CPU tests / CPU-mesh dryruns use the XLA path)."""
    import jax

    return (settings.use_fused_mlp
            and settings.depth == 2
            and not settings.skips
            and settings.embedder == "none"
            and jax.default_backend() == "tpu")


def pack_params(params: dict, settings: DecoderSettings) -> FusedParams:
    """Convert the dict decoder params (models/decoder.py) to kernel layout."""
    assert settings.depth == 2 and not settings.skips \
        and settings.embedder == "none", "fused kernel: default arch only"
    sd = settings.sdf_dim
    w_sdf = params["sdf_out"]["w"]                    # (width, 1 + sd)
    b_sdf = params["sdf_out"]["b"]
    # permute sdf col (index 0) to the end
    ws = jnp.concatenate([w_sdf[:, 1:], w_sdf[:, :1]], axis=1)
    bs = jnp.concatenate([b_sdf[1:], b_sdf[:1]])[None, :]
    wc = params["color0"]["w"]                        # (sd + in_dim, width)
    return FusedParams(
        w1=params["layers"][0]["w"], b1=params["layers"][0]["b"][None, :],
        w2=params["layers"][1]["w"], b2=params["layers"][1]["b"][None, :],
        ws=ws, bs=bs,
        wc_f=wc[:sd], wc_x=wc[sd:], bc=params["color0"]["b"][None, :],
        wo=params["color1"]["w"], bo=params["color1"]["b"][None, :])


def unpack_grads(g: FusedParams, settings: DecoderSettings) -> dict:
    """Kernel-layout gradients -> dict layout matching models/decoder.py."""
    ws = g.ws
    w_sdf = jnp.concatenate([ws[:, -1:], ws[:, :-1]], axis=1)
    b_sdf = jnp.concatenate([g.bs[0, -1:], g.bs[0, :-1]])
    return {
        "layers": [{"w": g.w1, "b": g.b1[0]}, {"w": g.w2, "b": g.b2[0]}],
        "sdf_out": {"w": w_sdf, "b": b_sdf},
        "color0": {"w": jnp.concatenate([g.wc_f, g.wc_x], axis=0),
                   "b": g.bc[0]},
        "color1": {"w": g.wo, "b": g.bo[0]},
    }


# The package-global jax_default_matmul_precision=highest (set for the
# geometry paths — see proudslam_tpu/__init__.py) would make Mosaic emulate
# every in-kernel f32 dot with multi-pass scratch, blowing the 16 MB scoped
# VMEM budget. The decoder tolerates bf16 MXU operands (f32 accumulate) —
# the XLA path runs matmul_dtype="bf16" in the bench config with unchanged
# ATE — and bf16 doubles MXU throughput over single-pass f32, which is
# what let the round-3 f32 kernel lose to XLA. Pin explicitly; the operand
# cast is gated on DecoderSettings.matmul_dtype so a f32 config gets the
# same dtype semantics as the XLA path (ADVICE r4 #3).
_PREC = jax.lax.Precision.DEFAULT
_BF16 = jnp.bfloat16


def _make_dot(bf16: bool):
    def _dot(a, b):
        if bf16:
            a, b = a.astype(_BF16), b.astype(_BF16)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=_PREC)
    return _dot


def _fwd_tile(x, p: Tuple[jnp.ndarray, ...], bf16: bool):
    _dot = _make_dot(bf16)
    (w1, b1, w2, b2, ws, bs, wc_f, wc_x, bc, wo, bo) = p
    h1 = jax.nn.relu(_dot(x, w1) + b1)
    h2 = jax.nn.relu(_dot(h1, w2) + b2)
    so = _dot(h2, ws) + bs
    feat = so[:, :-1]
    sdf = so[:, -1:]
    hc = jax.nn.relu(_dot(feat, wc_f) + _dot(x, wc_x) + bc)
    rgb = jax.nn.sigmoid(_dot(hc, wo) + bo)
    return h1, h2, feat, sdf, hc, rgb


def _fwd_kernel(x_ref, w1, b1, w2, b2, ws, bs, wc_f, wc_x, bc, wo, bo,
                out_ref, *, bf16: bool):
    x = x_ref[:]
    p = (w1[:], b1[:], w2[:], b2[:], ws[:], bs[:], wc_f[:], wc_x[:],
         bc[:], wo[:], bo[:])
    _, _, _, sdf, _, rgb = _fwd_tile(x, p, bf16)
    out_ref[:] = jnp.concatenate([rgb, sdf], axis=1)


def _bwd_kernel(x_ref, g_ref, w1, b1, w2, b2, ws, bs, wc_f, wc_x, bc, wo, bo,
                dx_ref, dw1, db1, dw2, db2, dws, dbs, dwc_f, dwc_x, dbc,
                dwo, dbo, *, bf16: bool):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        for ref in (dw1, db1, dw2, db2, dws, dbs, dwc_f, dwc_x, dbc, dwo,
                    dbo):
            ref[:] = jnp.zeros_like(ref)

    x = x_ref[:]
    g = g_ref[:]
    p = (w1[:], b1[:], w2[:], b2[:], ws[:], bs[:], wc_f[:], wc_x[:],
         bc[:], wo[:], bo[:])
    h1, h2, feat, sdf, hc, rgb = _fwd_tile(x, p, bf16)
    _dot = _make_dot(bf16)

    f32 = jnp.float32
    cdims = (((0,), (0,)), ((), ()))        # contract the sample axis

    def _dotg(a, b):
        if bf16:
            a, b = a.astype(_BF16), b.astype(_BF16)
        return jax.lax.dot_general(a, b, cdims,
                                   preferred_element_type=f32,
                                   precision=_PREC)

    g_rgb = g[:, 0:3]
    g_sdf = g[:, 3:4]
    dzo = g_rgb * rgb * (1.0 - rgb)
    dwo[:] += _dotg(hc, dzo)
    dbo[:] += jnp.sum(dzo, axis=0, keepdims=True)
    dhc = _dot(dzo, wo[:].T)
    dhc = dhc * (hc > 0)

    dwc_f[:] += _dotg(feat, dhc)
    dwc_x[:] += _dotg(x, dhc)
    dbc[:] += jnp.sum(dhc, axis=0, keepdims=True)
    dfeat = _dot(dhc, wc_f[:].T)

    dso = jnp.concatenate([dfeat, g_sdf], axis=1)
    dws[:] += _dotg(h2, dso)
    dbs[:] += jnp.sum(dso, axis=0, keepdims=True)
    dh2 = _dot(dso, ws[:].T)
    dh2 = dh2 * (h2 > 0)

    dw2[:] += _dotg(h1, dh2)
    db2[:] += jnp.sum(dh2, axis=0, keepdims=True)
    dh1 = _dot(dh2, w2[:].T)
    dh1 = dh1 * (h1 > 0)

    dw1[:] += _dotg(x, dh1)
    db1[:] += jnp.sum(dh1, axis=0, keepdims=True)
    dx_ref[:] = _dot(dh1, w1[:].T) + _dot(dhc, wc_x[:].T)


def _param_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(11)]


def _run_fwd(x: jnp.ndarray, fp: FusedParams, interpret: bool,
             bf16: bool) -> jnp.ndarray:
    N = x.shape[0]
    grid = N // TILE
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bf16=bf16),
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + _param_specs(),
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 4), jnp.float32),
        interpret=interpret,
    )(x, *fp)


def _run_bwd(x: jnp.ndarray, g: jnp.ndarray, fp: FusedParams,
             interpret: bool, bf16: bool):
    N, D = x.shape
    grid = N // TILE
    out_shapes = (
        jax.ShapeDtypeStruct((N, D), jnp.float32),   # dx
        *(jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in fp),
    )
    const = lambda i: tuple(0 for _ in range(2))  # noqa: E731
    out_specs = (
        pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        *(pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
          for p in fp),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, bf16=bf16),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + _param_specs(),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, g, *fp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_decoder(x: jnp.ndarray, fp: FusedParams,
                  interpret: bool = False, bf16: bool = True) -> jnp.ndarray:
    """(N, in_dim) features -> (N, 4) [r, g, b, sdf]; N padded to TILE."""
    return _run_fwd(x, fp, interpret, bf16)


def _vjp_fwd(x, fp, interpret, bf16):
    return _run_fwd(x, fp, interpret, bf16), (x, fp)


def _vjp_bwd(interpret, bf16, res, g):
    x, fp = res
    outs = _run_bwd(x, g, fp, interpret, bf16)
    dx = outs[0]
    dfp = FusedParams(*outs[1:])
    return dx, dfp


fused_decoder.defvjp(_vjp_fwd, _vjp_bwd)


def decoder_values_fused(params: dict, settings: DecoderSettings,
                         x: jnp.ndarray, interpret: bool = False
                         ) -> jnp.ndarray:
    """Drop-in replacement for models.decoder.decoder_values (default arch).

    Pads the sample count to a TILE multiple; gradients flow to both the
    features and the (dict-layout) parameters through the custom VJP.
    The matmul operand dtype follows ``settings.matmul_dtype`` ("bf16"
    casts operands, f32 accumulate — same semantics as the XLA path).
    """
    fp = pack_params(params, settings)
    N = x.shape[0]
    pad = (-N) % TILE
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    out = fused_decoder(x, fp, interpret, settings.matmul_dtype == "bf16")
    return out[:N]
