"""Fused sample-feature + decoder forward as one Pallas TPU kernel.

The XLA render forward materializes ~300 MB of (R,S,128) intermediates in
HBM per BA iteration: the one-hot expansion of per-hit-slot corner
features to samples (f8), the trilinear blend, and every decoder
activation. This kernel fuses, per ray tile,

    slot select (bins -> rb row)  ->  trilinear blend  ->  MLP decode

keeping everything in VMEM. Inputs are only the (R,H,8D) per-hit-slot
corner features (rb = `ops.interp.corner_view` rows gathered at the hit
voxels), the per-sample hit-slot bins and depths, per-ray origins and
directions, packed voxel keys of the hit slots (centers are unpacked
in-kernel — 3 ints beat 3 float rows), and the decoder weights. Outputs:
(R*S, 4) rgb+sdf and the blended (R*S, D) features (saved for the XLA
backward, which is unchanged — see `render/renderer.py`).

Replaces the forward half of the reference's CUDA hot loop
(`render_helpers.py:469-545`: get_features_vox + MLP). The backward
stays XLA: its cost structure (einsum transpose + wide-row scatter +
inverse-map fold, `ops/interp.py`) already avoids the HBM blowup.

Applies to the default decoder architecture only (depth=2, no skips,
identity embedder) — `fused_render_applicable` gates it; the pure-XLA
path remains the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from proudslam_tpu.config import DecoderSettings, RenderSettings
from proudslam_tpu.ops.pallas.mlp_kernel import FusedParams, pack_params

RAY_TILE = 128          # rays per grid step
_BF16 = jnp.bfloat16

# corner offset bits (j>>2, (j>>1)&1, j&1), z fastest — must match
# ops/interp.CORNER_BITS / voxel_hash.CORNER_OFFSETS
_CORNER = [(j >> 2, (j >> 1) & 1, j & 1) for j in range(8)]


def fused_render_applicable(dec: DecoderSettings) -> bool:
    return (dec.use_fused_mlp and dec.depth == 2 and not dec.skips
            and dec.embedder == "none"
            and jax.default_backend() == "tpu")


def _dot(a, b):
    # precision pinned to DEFAULT: the package-global
    # jax_default_matmul_precision=highest would make Mosaic emulate the
    # bf16 dot multi-pass, which it rejects ("Bad lhs type")
    return jnp.dot(a.astype(_BF16), b.astype(_BF16),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _kernel(rb_ref, keys_ref, bins_ref, z_ref, o_ref, d_ref,
            w1, b1, w2, b2, ws, bs, wc_f, wc_x, bc, wo, bo,
            out_ref, feats_ref, *, H: int, S: int, D: int,
            voxel_size: float, bits: int, sub: int):
    Rt = rb_ref.shape[0]
    K = 8 * D

    def bcast(x, shape, dims):
        # Mosaic rejects rank-raising reshapes (e.g. (R,S)->(R,S,1));
        # broadcast_in_dim lowers to a supported broadcast directly
        return jax.lax.broadcast_in_dim(x, shape, dims)

    bins = bins_ref[:]                               # (Rt, S) int32
    z = z_ref[:]                                     # (Rt, S)
    brow = lambda v: bcast(v, (Rt, S), (0,))
    sx = (brow(o_ref[:, 0]) + brow(d_ref[:, 0]) * z) / voxel_size
    sy = (brow(o_ref[:, 1]) + brow(d_ref[:, 1]) * z) / voxel_size
    sz = (brow(o_ref[:, 2]) + brow(d_ref[:, 2]) * z) / voxel_size

    bias = 1 << (bits - 1)
    kmask = (1 << bits) - 1

    # loop hit slots x corners, accumulating directly into (Rt, S, D)
    # features — never materializing the (Rt, S, 8D) per-sample corner
    # expansion (that formulation measured ~2x slower: ~20 full-size VMEM
    # passes). A sample's mask (bins == h) selects exactly one slot, so
    # the accumulation equals select-then-blend.
    feats = jnp.zeros((Rt, S, D), jnp.float32)
    for h in range(H):
        keyh = keys_ref[:, h]                        # (Rt,) int32
        cxh = (((keyh >> (2 * bits)) & kmask) - bias).astype(jnp.float32)
        cyh = (((keyh >> bits) & kmask) - bias).astype(jnp.float32)
        czh = ((keyh & kmask) - bias).astype(jnp.float32)
        px = sx - brow(cxh)                          # fractional coord
        py = sy - brow(cyh)
        pz = sz - brow(czh)
        mh = (bins == h).astype(jnp.float32)         # implies bins < H
        for j, (qx, qy, qz) in enumerate(_CORNER):
            w = ((px if qx else (1.0 - px))
                 * (py if qy else (1.0 - py))
                 * (pz if qz else (1.0 - pz)) * mh)
            feats = feats + (bcast(w, (Rt, S, D), (0, 1))
                             * bcast(rb_ref[:, h, j * D:(j + 1) * D],
                                     (Rt, S, D), (0, 2)))

    feats2 = feats.reshape(Rt * S, D)
    feats_ref[:] = feats2

    # decoder MLP (bf16 MXU operands, f32 accumulate), in row sub-tiles
    # to bound VMEM for the (rows, width) activations
    rows = Rt * S
    for s0 in range(0, rows, sub):
        x = feats2[s0:s0 + sub]
        h1 = jax.nn.relu(_dot(x, w1[:]) + b1[:])
        h2 = jax.nn.relu(_dot(h1, w2[:]) + b2[:])
        so = _dot(h2, ws[:]) + bs[:]
        feat = so[:, :-1]
        sdf = so[:, -1:]
        hc = jax.nn.relu(_dot(feat, wc_f[:]) + _dot(x, wc_x[:]) + bc[:])
        rgb = jax.nn.sigmoid(_dot(hc, wo[:]) + bo[:])
        out_ref[s0:s0 + sub, :] = jnp.concatenate([rgb, sdf], axis=1)


@functools.partial(
    jax.jit, static_argnames=("settings", "dec", "interpret"))
def fused_render_forward(rb: jnp.ndarray, keys_rb: jnp.ndarray,
                         bins: jnp.ndarray, z: jnp.ndarray,
                         rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                         params: dict, settings: RenderSettings,
                         dec: DecoderSettings, interpret: bool = False):
    """-> (out (R*S, 4) [r,g,b,sdf], feats (R*S, D)).

    Args:
      rb: (R, H, 8D) f32 corner features per hit slot.
      keys_rb: (R, H) int32 packed voxel keys of the hit slots.
      bins: (R, S) int32 hit-slot bin per sample, == H for invalid lanes
        (invalid lanes produce zero features, like the XLA path).
      z: (R, S) f32 sample depths; rays_o/rays_d: (R, 3).
    """
    R, H, K = rb.shape
    S = bins.shape[1]
    D = K // 8
    interpret = interpret or jax.default_backend() != "tpu"
    fp = pack_params(params, dec)
    pad = (-R) % RAY_TILE
    if pad:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        rb, keys_rb, z, rays_o, rays_d = map(
            zpad, (rb, keys_rb, z, rays_o, rays_d))
        bins = jnp.concatenate(
            [bins, jnp.full((pad, S), H, bins.dtype)], axis=0)
    Rp = rb.shape[0]
    grid = (Rp // RAY_TILE,)
    # 2048-row MLP sub-tiles: Mosaic rejects bf16 matmuls with larger row
    # blocks ("Bad lhs type" at 4096x128 x 128x128)
    sub = 2048
    kern = functools.partial(
        _kernel, H=H, S=S, D=D, voxel_size=settings.voxel_size,
        bits=10, sub=min(sub, RAY_TILE * S))
    tile = lambda *shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out, feats = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            tile(RAY_TILE, H, K), tile(RAY_TILE, H), tile(RAY_TILE, S),
            tile(RAY_TILE, S), tile(RAY_TILE, 3), tile(RAY_TILE, 3),
        ] + [full() for _ in range(11)],
        out_specs=(
            pl.BlockSpec((RAY_TILE * S, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE * S, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rp * S, 4), jnp.float32),
            jax.ShapeDtypeStruct((Rp * S, D), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rb, keys_rb, bins, z, rays_o, rays_d, *fp)
    if pad:
        out = out[:R * S]
        feats = feats[:R * S]
    return out, feats


# ---------------------------------------------------------------------------
# custom-VJP wrapper: fused forward, structured XLA backward
# ---------------------------------------------------------------------------

import numpy as _np  # noqa: E402

_FLOAT0 = jax.dtypes.float0
_CORNER_BITS = _np.array(_CORNER, dtype=_np.float32)       # (8, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_feats_decode(EV, keys_rb, vidx, bins, z, rays_o, rays_d,
                       params, settings: RenderSettings,
                       dec: DecoderSettings):
    """Corner view -> per-sample [r,g,b,sdf], fused forward.

    Differentiable w.r.t. EV (embedding corner view — compose with
    `ops.interp.corner_view` for embedding-table gradients), rays_o/rays_d
    (pose), and the decoder params. ``z`` cotangent is zero (the renderer
    stop-grads sample depths, reference `voxel_helpers.py:364-366`).
    """
    out, _ = fused_render_forward(EV[vidx], keys_rb, bins, z,
                                  rays_o, rays_d, params, settings, dec)
    return out


def _ffd_fwd(EV, keys_rb, vidx, bins, z, rays_o, rays_d, params,
             settings, dec):
    rb = EV[vidx]
    out, feats = fused_render_forward(rb, keys_rb, bins, z, rays_o, rays_d,
                                      params, settings, dec)
    return out, (EV, keys_rb, vidx, bins, z, rays_o, rays_d, params, feats)


def _ffd_bwd(settings, dec, res, d_out):
    from proudslam_tpu.ops.pallas.mlp_kernel import _run_bwd, unpack_grads
    from proudslam_tpu.ops.voxel_hash import unpack_key

    EV, keys_rb, vidx, bins, z, rays_o, rays_d, params, feats = res
    V = EV.shape[0]
    R, H = vidx.shape
    S = bins.shape[1]
    D = feats.shape[1]
    K = 8 * D
    vox = settings.voxel_size
    HI = jax.lax.Precision.HIGHEST

    # decoder backward: the fused bf16 Pallas MLP bwd over saved features
    # (rows padded to its TILE multiple — zero rows contribute zero grads)
    from proudslam_tpu.ops.pallas import mlp_kernel as mk
    fp = pack_params(params, dec)
    rows = feats.shape[0]
    padr = (-rows) % mk.TILE
    fpad = feats if not padr else jnp.concatenate(
        [feats, jnp.zeros((padr, D), feats.dtype)])
    gpad = d_out if not padr else jnp.concatenate(
        [d_out, jnp.zeros((padr, 4), d_out.dtype)])
    # bf16=True: this kernel's forward is bf16-only (see _dot above)
    outs = _run_bwd(fpad, gpad, fp,
                    interpret=jax.default_backend() != "tpu", bf16=True)
    d_feats = outs[0][:rows].reshape(R, S, D)
    d_params = unpack_grads(FusedParams(*outs[1:]), dec)

    onehot = (bins[:, :, None]
              == jnp.arange(H, dtype=bins.dtype)).astype(jnp.float32)
    centers_rb = (unpack_key(keys_rb).astype(jnp.float32) + 0.5) * vox
    center = jnp.einsum("rsh,rhc->rsc", onehot, centers_rb, precision=HI)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    p = (xyz - center) / vox + 0.5                        # (R, S, 3)
    valid = (bins < H).astype(jnp.float32)

    q = _CORNER_BITS[None, None]                          # (1, 1, 8, 3)
    pe = p[:, :, None, :]                                 # (R, S, 1, 3)
    ax = pe * q + (1.0 - pe) * (1.0 - q)                  # (R, S, 8, 3)
    w = jnp.prod(ax, axis=-1) * valid[:, :, None]         # (R, S, 8)

    # d wrt f8 -> per-hit-slot rows -> corner view (the production
    # wide-row path, `ops/interp.py`)
    g8 = (w[..., None] * d_feats[:, :, None, :]).reshape(R, S, K)
    d_rb = jnp.einsum("rsh,rsk->rhk", onehot, g8, precision=HI)
    dEV = jnp.zeros((V, K), g8.dtype).at[
        jnp.maximum(vidx, 0).reshape(-1)].add(d_rb.reshape(-1, K))

    # pose path: dL/dw_j = f8_j . d_feats (f8 recomputed — cheaper than
    # saving the 300 MB forward expansion), then the trilinear derivative
    rb = EV[vidx]
    f8 = jnp.einsum("rsh,rhk->rsk", onehot, rb,
                    precision=HI).reshape(R, S, 8, D)
    d_w = jnp.einsum("rsjd,rsd->rsj", f8, d_feats)        # (R, S, 8)
    sign = 2.0 * q - 1.0                                  # (1, 1, 8, 3)
    others = jnp.stack(
        [ax[..., 1] * ax[..., 2], ax[..., 0] * ax[..., 2],
         ax[..., 0] * ax[..., 1]], axis=-1)               # (R, S, 8, 3)
    d_p = jnp.sum(d_w[..., None] * sign * others, axis=2)  # (R, S, 3)
    d_xyz = d_p * (valid[..., None] / vox)
    d_o = jnp.sum(d_xyz, axis=1)                          # (R, 3)
    d_d = jnp.sum(d_xyz * z[..., None], axis=1)           # (R, 3)

    z0 = lambda a: _np.zeros(a.shape, _FLOAT0)
    return (dEV, z0(keys_rb), z0(vidx), z0(bins), jnp.zeros_like(z),
            d_o, d_d, d_params)


fused_feats_decode.defvjp(_ffd_fwd, _ffd_bwd)
