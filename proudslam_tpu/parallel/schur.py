"""Schur-complement-structured distributed Gauss-Newton BA step.

Implements the ARCHITECTURE.md design sketch ("Schur-structured distributed
bundle adjustment"): the BA normal equations over keyframe poses T (6 dof
each) and embedding rows W (D floats each) have the classic arrow
structure — H_ww is block-diagonal per embedding row (a row only couples
to residuals of rays that sample its adjacent voxels), H_tt is 6x6 per
pose, and the Schur complement S = H_tt − H_tw H_ww⁻¹ H_wt reduces the
joint solve to a tiny dense pose system.

Distribution over a 1-axis device mesh (`parallel/spatial.py` layout —
rays AND embedding rows sharded over the same axis):

* each device renders its ray shard and computes the per-residual
  Jacobian slices (depth residual per ray — the dominant geometric term);
* per-row D×D H_ww blocks and the J_wᵀr gradient accumulate as **psum**s
  whose owner shard keeps its rows (the wire pattern of the existing
  embedding-gradient psum_scatter);
* the H_ww⁻¹ apply is an **owner-local batched Cholesky** over the
  device's rows;
* each pose's 6×6 H_tt block — 21 unique floats, the "K×21 psum" of the
  sketch — and the (6K,6K) Schur correction psum over the ray shards;
* the pose solve is a replicated dense Cholesky of S (6K ≤ 384);
* the map update ΔW = −H_ww⁻¹(g_w + H_wt ΔT) is owner-local
  back-substitution.

The per-residual Jacobians here come from `jax.jacrev` over the ray shard
(exact, test-scale); a pod-scale implementation would assemble them from
the analytic per-(ray, hit-slot) sparsity the production backward already
exploits (`ops/interp.py`) — the solve/collective structure, which is
what this module demonstrates and what `tests/test_schur.py` verifies
against a dense joint solve, is identical.

Reference: the system being upgraded is the first-order joint Adam of
`bundle_adjust_frames` (`/root/reference/src/variations/render_helpers.py:
559-676`); the reference has no second-order solver.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from proudslam_tpu.config import SystemSettings
from proudslam_tpu.geometry import se3
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.render.renderer import render_rays


class GNResult(NamedTuple):
    d_emb: jnp.ndarray     # (E, D) map update (full table, owner-written)
    d_poses: jnp.ndarray   # (K, 6) pose tangent update
    r_norm: jnp.ndarray    # () residual 2-norm before the step


def _depth_residuals(emb_full, poses, view, dec_params, dirs, gt_d, noise,
                     settings: SystemSettings, anchor_mask):
    """Per-ray depth residuals r_i = hit_i * (depth_i(W, T) − gt_i).

    dirs: (F, N, 3) camera-frame; poses (F, 6) tangents; gt_d (F, N).
    ``anchor_mask`` zeroes gauge-anchored pose rows' influence by
    stop-gradienting their pose (slot-0 convention of `engine/mapper.py`).
    """
    rnd = settings.render
    F, N = gt_d.shape
    p = jnp.where(anchor_mask[:, None], jax.lax.stop_gradient(poses), poses)
    R = se3.exp_rotation(p[:, 3:6])
    world_d = jnp.einsum("fnd,fed->fne", dirs, R).reshape(-1, 3)
    world_o = jnp.broadcast_to(p[:, None, 0:3], (F, N, 3)).reshape(-1, 3)
    out = render_rays(world_o, world_d, view, emb_full, dec_params,
                      settings.decoder, rnd,
                      noise.reshape(F * N, -1))
    hit = out.hit_mask.astype(jnp.float32)
    gd = gt_d.reshape(-1)
    valid = hit * jnp.where((gd > 0.01) & (gd < settings.loss.max_depth),
                            1.0, 0.0)
    return (out.depth - gd) * valid


def make_schur_gn_step(mesh: Mesh, settings: SystemSettings,
                       damping: float = 1e-4):
    """Jitted distributed GN step. Returns ``step(map_state, dec_params,
    poses, dirs, gt_d, noise, anchor_mask) -> GNResult``.

    Shapes: poses (K, 6); dirs (F=K, N, 3); gt_d (K, N); noise (K, N, SJ);
    anchor_mask (K,) bool. N and E must divide the mesh size.
    """
    settings = dataclasses.replace(
        settings,
        decoder=dataclasses.replace(settings.decoder, use_fused_mlp=False))
    axes = mesh.axis_names
    n = mesh.size

    def step_fn(vox_keys, vvids, num_voxels, emb, dec_params, poses,
                dirs, gt_d, noise, anchor_mask):
        # local: emb (E/n, D); dirs (K, N/n, 3); gt_d (K, N/n);
        # replicated: everything else.
        El, D = emb.shape
        K = poses.shape[0]
        keys_full = jax.lax.all_gather(vox_keys, axes, tiled=True)
        vvids_full = jax.lax.all_gather(vvids, axes, tiled=True)
        dummy = jnp.zeros((1,), jnp.int32)
        view = vh.MapState(
            cell_keys=dummy, cell_ids=dummy, cell_vslot=dummy,
            num_cells=num_voxels, voxel_keys=keys_full,
            voxel_vertex_ids=vvids_full, num_voxels=num_voxels,
            embeddings=jnp.zeros((0, 0)))

        def res_fn(emb_shard, poses):
            emb_full = jax.lax.all_gather(emb_shard, axes, tiled=True)
            return _depth_residuals(emb_full, poses, view, dec_params,
                                    dirs, gt_d, noise, settings,
                                    anchor_mask)

        r = res_fn(emb, poses)                              # (Rl,)
        # exact per-residual Jacobian over the LOCAL ray shard. J_w is
        # w.r.t. the FULL table (the all_gather transpose inside jacrev
        # psum_scatters nothing here — jacrev sees the shard argument, so
        # columns for non-owned rows come back through the gather's
        # transpose; we instead differentiate w.r.t. the gathered table to
        # get full columns, then psum row-blocks to owners below).
        E = El * n

        def res_full(emb_full, poses):
            return _depth_residuals(emb_full, poses, view, dec_params,
                                    dirs, gt_d, noise, settings,
                                    anchor_mask)

        emb_full = jax.lax.all_gather(emb, axes, tiled=True)
        Jw, Jt = jax.jacrev(res_full, argnums=(0, 1))(emb_full, poses)
        Rl = r.shape[0]
        Jw = Jw.reshape(Rl, E, D)
        Jt = Jt.reshape(Rl, K * 6)

        # --- gradient + per-row D×D blocks: psum, owners keep their rows
        g_w = jax.lax.psum(jnp.einsum("red,r->ed", Jw, r), axes)   # (E, D)
        Hww = jax.lax.psum(jnp.einsum("red,ref->edf", Jw, Jw),
                           axes)                                   # (E,D,D)
        Hww = Hww + damping * jnp.eye(D)[None]

        # --- pose system: H_tt (per-pose 6×6 → K×21 unique floats) and
        # the g_t gradient, psummed over ray shards
        g_t = jax.lax.psum(Jt.T @ r, axes)                  # (6K,)
        Htt = jax.lax.psum(Jt.T @ Jt, axes)                 # (6K, 6K)
        Htw = jax.lax.psum(jnp.einsum("rk,red->ked", Jt, Jw),
                           axes)                            # (6K, E, D)

        # --- owner-local Cholesky over this device's row block
        own = jax.lax.axis_index(axes[0]) * El
        Hb = jax.lax.dynamic_slice_in_dim(Hww, own, El, axis=0)
        Lb = jnp.linalg.cholesky(Hb)                        # (El, D, D)

        def chol_apply(b):                                  # (El, D)
            y = jax.scipy.linalg.solve_triangular(Lb, b[..., None],
                                                  lower=True)
            return jax.scipy.linalg.solve_triangular(
                Lb.transpose(0, 2, 1), y, lower=False)[..., 0]

        gw_own = jax.lax.dynamic_slice_in_dim(g_w, own, El, axis=0)
        Htw_own = jax.lax.dynamic_slice_in_dim(Htw, own, El, axis=1)
        Winv_g = chol_apply(gw_own)                         # (El, D)
        # Schur correction + rhs correction: owner-partial, psum
        Winv_Hwt = jax.vmap(chol_apply, in_axes=1, out_axes=1)(
            Htw_own.transpose(1, 0, 2))                     # (El, 6K, D)
        corr_S = jax.lax.psum(
            jnp.einsum("ked,eld->kl", Htw_own, Winv_Hwt), axes)
        corr_g = jax.lax.psum(
            jnp.einsum("ked,ed->k", Htw_own, Winv_g), axes)

        S = Htt - corr_S + damping * jnp.eye(K * 6)
        rhs = g_t - corr_g
        d_t = -jnp.linalg.solve(S, rhs)                     # (6K,)

        # --- back-substitution: ΔW = −H_ww⁻¹ (g_w + H_wt ΔT), owner-local
        hwt_dt = jnp.einsum("ked,k->ed", Htw_own, d_t)      # (El, D)
        d_w_own = -chol_apply(gw_own + hwt_dt)              # (El, D)

        r_norm = jnp.sqrt(jax.lax.psum(jnp.sum(r * r), axes))
        d_poses = d_t.reshape(K, 6)
        d_poses = jnp.where(anchor_mask[:, None], 0.0, d_poses)
        return d_w_own, d_poses, r_norm

    shard = P(axes)
    sharded = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(shard, P(axes, None), P(), P(axes, None), P(), P(),
                  P(None, axes, None), P(None, axes), P(None, axes, None),
                  P()),
        out_specs=(P(axes, None), P(), P()),
        check_vma=False)

    def step(map_state: vh.MapState, dec_params, poses, dirs, gt_d, noise,
             anchor_mask) -> GNResult:
        E = map_state.embeddings.shape[0]
        N = dirs.shape[1]
        assert E % n == 0 and N % n == 0, (E, N, n)
        d_w, d_t, r_norm = sharded(
            map_state.voxel_keys, map_state.voxel_vertex_ids,
            map_state.num_voxels, map_state.embeddings, dec_params, poses,
            dirs, gt_d, noise, anchor_mask)
        return GNResult(d_emb=d_w, d_poses=d_t, r_norm=r_norm)

    return jax.jit(step)


def dense_gn_reference(map_state, dec_params, poses, dirs, gt_d, noise,
                       settings: SystemSettings, anchor_mask,
                       damping: float = 1e-4):
    """Single-device dense joint GN solve (the correctness oracle).

    Assembles the full H = [[H_ww, H_wt], [H_tw, H_tt]] + λI and solves
    the joint system directly — no Schur factorization. The distributed
    step must reproduce this up to solver tolerance.
    """
    settings = dataclasses.replace(
        settings,
        decoder=dataclasses.replace(settings.decoder, use_fused_mlp=False))
    E, D = map_state.embeddings.shape
    K = poses.shape[0]

    def res_fn(emb, poses):
        return _depth_residuals(emb, poses, map_state, dec_params,
                                dirs, gt_d, noise, settings, anchor_mask)

    r = res_fn(map_state.embeddings, poses)
    Jw, Jt = jax.jacrev(res_fn, argnums=(0, 1))(map_state.embeddings, poses)
    R = r.shape[0]
    Jw = np.asarray(Jw).reshape(R, E * D)
    Jt = np.asarray(Jt).reshape(R, K * 6)
    # gauge: anchored pose columns carry zero Jacobian already (stop_grad)
    J = np.concatenate([Jw, Jt], axis=1)
    g = J.T @ np.asarray(r)
    H = J.T @ J
    # block-diagonal H_ww approximation — the structure the Schur step
    # factorizes. Per-row D×D blocks kept, cross-row coupling dropped.
    Hww = H[:E * D, :E * D]
    Hbd = np.zeros_like(Hww)
    for e in range(E):
        s = slice(e * D, (e + 1) * D)
        Hbd[s, s] = Hww[s, s]
    H[:E * D, :E * D] = Hbd
    H += damping * np.eye(H.shape[0])
    # anchored pose rows: freeze via identity rows (their J columns are 0)
    d = -np.linalg.solve(H, g)
    d_emb = d[:E * D].reshape(E, D)
    d_poses = d[E * D:].reshape(K, 6)
    d_poses[np.asarray(anchor_mask)] = 0.0
    return d_emb, d_poses, float(np.linalg.norm(np.asarray(r)))
