"""Multi-chip scale-out: device mesh + sharded bundle-adjustment step.

The reference's only parallelism is two OS processes on one GPU exchanging
pickled snapshots (SURVEY.md §2.3). The TPU-native scale-out is a single
SPMD program over a ``jax.sharding.Mesh`` with two axes:

  * ``dp`` — data parallel over the ray batch: each device renders a shard
    of the sampled rays; the gradient reduction onto replicated /
    model-sharded parameters becomes an XLA ``psum`` over ICI.
  * ``mp`` — model parallel: the vertex-embedding table is row-sharded
    (the map is the "model" in a SLAM engine — scaling map extent means
    scaling embedding rows), and the decoder MLP's hidden width is sharded
    tensor-parallel style (first-layer columns / second-layer rows, with a
    psum after the contraction).

Everything is expressed with sharding constraints under ``jit`` — XLA GSPMD
inserts the collectives (all-gather for the embedding-row gathers, psum for
grad reductions) so the same program runs on 1 chip or a pod slice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from proudslam_tpu.config import SystemSettings
from proudslam_tpu.geometry import se3
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.render.losses import compute_loss
from proudslam_tpu.render.renderer import render_rays


def make_mesh(n_devices: Optional[int] = None,
              mp: Optional[int] = None) -> Mesh:
    """Build a (dp, mp) mesh over the first ``n_devices`` devices.

    mp defaults to 2 when the device count allows a 2D mesh, else 1.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if mp is None:
        mp = 2 if (n % 2 == 0 and n >= 4) else 1
    dp = n // mp
    assert dp * mp == n, (dp, mp, n)
    arr = np.array(devices).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def _constrain(x, mesh: Mesh, spec: P):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def make_sharded_ba_step(mesh: Mesh, settings: SystemSettings):
    """A jitted full training step (bundle-adjustment iteration) sharded
    over the mesh: rays on ``dp``, embedding rows + decoder width on ``mp``.

    Returns ``step(map_state, decoder_params, poses, dirs, gt_c, gt_d,
    noise) -> (new_embeddings, new_decoder_params, new_poses, loss)`` where
    ``dirs/gt_*/noise`` are (F, N, ...) per-frame ray batches. Updates are
    plain SGD here — optimizer choice is orthogonal to the sharding; the
    single-chip engine uses Adam (`engine/mapper.py`).
    """
    import dataclasses

    # the fused Pallas MLP is a single-device kernel; under GSPMD the
    # decoder width is mp-sharded, so the generic XLA path is used here
    settings = dataclasses.replace(
        settings,
        decoder=dataclasses.replace(settings.decoder, use_fused_mlp=False))
    rnd = settings.render
    SJ = rnd.max_samples - rnd.max_hits

    def shard_params(dec_params):
        out = dict(dec_params)
        layers = []
        for i, layer in enumerate(dec_params["layers"]):
            if i == 0:
                layers.append({
                    "w": _constrain(layer["w"], mesh, P(None, "mp")),
                    "b": _constrain(layer["b"], mesh, P("mp")),
                })
            else:
                layers.append({
                    "w": _constrain(layer["w"], mesh, P("mp", None)),
                    "b": layer["b"],
                })
        out["layers"] = layers
        return out

    def step(map_state: vh.MapState, dec_params, poses,
             dirs, gt_c, gt_d, noise, lr=1e-2):
        F, N = dirs.shape[:2]
        embeddings = _constrain(map_state.embeddings, mesh, P("mp", None))
        dec_params = shard_params(dec_params)

        def loss_fn(embeddings, dec_params, poses):
            R = se3.exp_rotation(poses[:, 3:6])
            world_d = jnp.einsum("fnd,fed->fne", dirs, R).reshape(-1, 3)
            world_o = jnp.broadcast_to(
                poses[:, None, 0:3], (F, N, 3)).reshape(-1, 3)
            world_d = _constrain(world_d, mesh, P("dp", None))
            world_o = _constrain(world_o, mesh, P("dp", None))
            outputs = render_rays(
                world_o, world_d, map_state, embeddings,
                dec_params, settings.decoder, rnd, noise.reshape(-1, SJ))
            loss, _ = compute_loss(
                outputs, gt_c.reshape(-1, 3), gt_d.reshape(-1),
                settings.loss)
            return loss

        loss, (g_emb, g_dec, g_pose) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2))(embeddings, dec_params, poses)
        new_emb = embeddings - lr * g_emb
        new_dec = jax.tree.map(lambda p, g: p - lr * g, dec_params, g_dec)
        new_poses = poses - lr * g_pose
        return new_emb, new_dec, new_poses, loss

    return jax.jit(step)
