"""The restructured embedding gather (`ops/interp.py::gather_ray_features`)
against the one-hot-einsum oracle: forward values and, critically, the
custom-VJP gradients (embedding fold via inverse vertex map + segment-sum),
plus the inverse-map invariants maintained by `voxel_hash.insert_points`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import MapSettings, RenderSettings
from proudslam_tpu.ops import voxel_hash as vh
from proudslam_tpu.ops.interp import (
    gather_ray_features, gather_ray_features_onehot)


def _small_map():
    rng = np.random.default_rng(0)
    coords = np.unique(rng.integers(-4, 4, (120, 3)), axis=0)
    s = MapSettings(voxel_size=0.2, num_embeddings=2048, embed_dim=8,
                    voxel_capacity=256, frame_voxel_capacity=64)
    return vh.build_map_state_numpy(coords, s), s


def _ray_batch(state, s, R=12, H=6, S=20):
    """Plausible (bins sorted, hits valid-prefix) sample topology."""
    rng = np.random.default_rng(1)
    nv = int(state.num_voxels)
    hit = rng.integers(0, nv, (R, H)).astype(np.int32)
    nhits = rng.integers(1, H + 1, (R,))
    hit[np.arange(H)[None, :] >= nhits[:, None]] = -1
    nsamp = rng.integers(1, S + 1, (R,))
    bins = np.full((R, S), H, np.int32)
    for r in range(R):
        b = np.sort(rng.integers(0, nhits[r], (nsamp[r],)))
        bins[r, :nsamp[r]] = b
    centers = np.asarray(vh.unpack_key(state.voxel_keys)) + 0.5
    xyz = np.zeros((R, S, 3), np.float32)
    for r in range(R):
        for i in range(S):
            v = hit[r, bins[r, i]] if bins[r, i] < H else 0
            xyz[r, i] = (centers[max(v, 0)]
                         + rng.uniform(-0.5, 0.5, 3)) * s.voxel_size
    return (jnp.asarray(xyz), jnp.asarray(bins), jnp.asarray(hit))


def test_forward_matches_onehot_oracle():
    state, s = _small_map()
    xyz, bins, hit = _ray_batch(state, s)
    new = gather_ray_features(xyz, bins, hit, state.voxel_keys,
                              state.voxel_vertex_ids, state.embeddings,
                              s.voxel_size, inv_map=state.inv_map)
    old = gather_ray_features_onehot(xyz, bins, hit, state.voxel_keys,
                                     state.voxel_vertex_ids,
                                     state.embeddings, s.voxel_size)
    valid = np.asarray(bins) < hit.shape[1]
    np.testing.assert_allclose(np.asarray(new)[valid], np.asarray(old)[valid],
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_oracle():
    state, s = _small_map()
    xyz, bins, hit = _ray_batch(state, s)
    valid = jnp.asarray(np.asarray(bins) < hit.shape[1])
    # weight per (ray, sample) so the loss exercises uneven cotangents
    wloss = jnp.asarray(
        np.random.default_rng(2).standard_normal(bins.shape + (1,)),
        jnp.float32) * valid[..., None]

    def loss_new(emb, xyz):
        out = gather_ray_features(xyz, bins, hit, state.voxel_keys,
                                  state.voxel_vertex_ids, emb,
                                  s.voxel_size, inv_map=state.inv_map)
        return jnp.sum(out * wloss)

    def loss_old(emb, xyz):
        out = gather_ray_features_onehot(xyz, bins, hit, state.voxel_keys,
                                         state.voxel_vertex_ids, emb,
                                         s.voxel_size)
        return jnp.sum(out * wloss)

    g_new = jax.grad(loss_new, argnums=(0, 1))(state.embeddings, xyz)
    g_old = jax.grad(loss_old, argnums=(0, 1))(state.embeddings, xyz)
    np.testing.assert_allclose(np.asarray(g_new[0]), np.asarray(g_old[0]),
                               rtol=1e-4, atol=1e-5)
    # xyz grads only meaningful at valid lanes (oracle's invalid lanes see
    # garbage centers; the new path zeroes them)
    np.testing.assert_allclose(np.asarray(g_new[1])[np.asarray(valid)],
                               np.asarray(g_old[1])[np.asarray(valid)],
                               rtol=1e-4, atol=1e-5)


def test_fallback_without_inv_map_matches():
    state, s = _small_map()
    xyz, bins, hit = _ray_batch(state, s)

    def loss(emb, inv):
        out = gather_ray_features(xyz, bins, hit, state.voxel_keys,
                                  state.voxel_vertex_ids, emb,
                                  s.voxel_size, inv_map=inv)
        return jnp.sum(out)

    g_inv = jax.grad(loss)(state.embeddings, state.inv_map)
    g_none = jax.grad(loss)(state.embeddings, None)
    np.testing.assert_allclose(np.asarray(g_inv), np.asarray(g_none),
                               rtol=1e-5, atol=1e-6)


def _check_inv(state):
    """inv_map rows exactly enumerate (voxel, corner) pairs per vertex."""
    inv = np.asarray(state.inv_map)
    vv = np.asarray(state.voxel_vertex_ids)
    nv = int(state.num_voxels)
    expect = {}
    for v in range(nv):
        for j in range(8):
            expect.setdefault(vv[v, j], set()).add(v * 8 + j)
    for e, pairs in expect.items():
        got = set(inv[e][inv[e] >= 0].tolist())
        assert got == pairs, (e, got, pairs)
    # rows for untouched vertices must be empty
    touched = set(expect)
    for e in range(inv.shape[0]):
        if e not in touched:
            assert (inv[e] == -1).all()


def test_inv_map_incremental_matches_batch():
    rng = np.random.default_rng(3)
    s = MapSettings(voxel_size=0.2, num_embeddings=2048, embed_dim=8,
                    voxel_capacity=256, frame_voxel_capacity=64)
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    # three overlapping insertions (shared vertices across calls)
    for lo in (-3, -2, -1):
        pts = rng.uniform(lo * 0.2, (lo + 3) * 0.2, (200, 3)).astype(
            np.float32)
        state = jax.jit(
            lambda st, p: vh.insert_points(
                st, p, jnp.ones((p.shape[0],), bool), s))(
                    state, jnp.asarray(pts))
    _check_inv(state)
