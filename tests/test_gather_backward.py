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


def test_precompute_f8_matches_inline():
    """gather_ray_features with the hoisted (f8, center) pair must equal
    the inline computation (the tracker hoists it out of its scan when
    embeddings are frozen and the batch is fixed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from proudslam_tpu.ops.interp import (
        corner_view, gather_ray_features, precompute_f8)
    from proudslam_tpu.ops import voxel_hash as vh
    from proudslam_tpu.config import MapSettings

    s = MapSettings(voxel_size=0.2, num_embeddings=512, embed_dim=8,
                    voxel_capacity=128, frame_voxel_capacity=64)
    key = jax.random.PRNGKey(0)
    state = vh.init_map_state(s, key)
    pts = np.stack(np.meshgrid(np.arange(4), np.arange(4)), -1)
    pts = np.concatenate([pts.reshape(-1, 2) * 0.2 + 0.1,
                          np.full((16, 1), 0.3)], 1)
    state = vh.insert_points(state, jnp.asarray(pts, jnp.float32),
                             jnp.ones((16,), bool), s)

    R, H, S = 8, 4, 10
    rng = np.random.default_rng(1)
    vidx = jnp.asarray(rng.integers(0, 16, (R, H)), jnp.int32)
    bins = jnp.asarray(np.sort(rng.integers(0, H + 1, (R, S)), axis=1),
                       jnp.int32)
    xyz = jnp.asarray(rng.uniform(0, 0.8, (R, S, 3)), jnp.float32)

    EV = corner_view(state.embeddings, state.voxel_vertex_ids,
                     state.inv_map)
    ref = gather_ray_features(xyz, bins, vidx, state.voxel_keys,
                              state.voxel_vertex_ids, state.embeddings,
                              s.voxel_size, inv_map=state.inv_map, EV=EV)
    f8c = precompute_f8(EV, jnp.maximum(vidx, 0), bins,
                        state.voxel_keys, s.voxel_size)
    out = gather_ray_features(xyz, bins, vidx, state.voxel_keys,
                              state.voxel_vertex_ids, state.embeddings,
                              s.voxel_size, f8_center=f8c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)

    # pose-path gradient (through xyz) must match too
    g_ref = jax.grad(lambda x: jnp.sum(gather_ray_features(
        x, bins, vidx, state.voxel_keys, state.voxel_vertex_ids,
        state.embeddings, s.voxel_size, EV=EV) ** 2))(xyz)
    g_out = jax.grad(lambda x: jnp.sum(gather_ray_features(
        x, bins, vidx, state.voxel_keys, state.voxel_vertex_ids,
        state.embeddings, s.voxel_size, f8_center=f8c) ** 2))(xyz)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)
