import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import MapSettings
from proudslam_tpu.ops import voxel_hash as vh


def small_settings(**kw):
    defaults = dict(voxel_size=0.2, num_embeddings=512, embed_dim=4,
                    voxel_capacity=256, frame_voxel_capacity=64)
    defaults.update(kw)
    return MapSettings(**defaults)


def test_pack_unpack_roundtrip():
    coords = jnp.array([[0, 0, 0], [1, 2, 3], [-5, 7, -9], [255, 255, 255],
                        [-256, -256, -256]], dtype=jnp.int32)
    keys = vh.pack_coords(coords)
    assert np.all(np.asarray(keys) != int(vh.SENTINEL))
    back = vh.unpack_key(keys)
    np.testing.assert_array_equal(back, coords)


def test_pack_out_of_range_is_sentinel():
    coords = jnp.array([[1000, 0, 0], [0, -1000, 0]], dtype=jnp.int32)
    keys = vh.pack_coords(coords)
    assert np.all(np.asarray(keys) == int(vh.SENTINEL))


def test_pack_orders_consistently():
    # packed keys sort like lexicographic coordinate order
    coords = jnp.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0]],
                       dtype=jnp.int32)
    keys = np.asarray(vh.pack_coords(coords))
    assert list(keys) == sorted(keys)


def test_insert_allocates_voxels_and_cells():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    # two points in the same voxel, one in a neighbor
    pts = jnp.array([[0.05, 0.05, 0.05],
                     [0.15, 0.1, 0.1],
                     [0.25, 0.05, 0.05]])
    valid = jnp.ones((3,), dtype=bool)
    state = vh.insert_points(state, pts, valid, s)
    assert int(state.num_voxels) == 2
    # voxels (0,0,0) and (1,0,0): corner cells = union of their 8 corners
    # -> 2x8 - 4 shared = 12 cells
    assert int(state.num_cells) == 12


def test_insert_shares_corner_embeddings():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    pts = jnp.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1]])  # voxels (0,0,0),(1,0,0)
    state = vh.insert_points(state, pts, jnp.ones((2,), bool), s)
    keys = np.asarray(state.voxel_keys[:2])
    coords = np.asarray(vh.unpack_key(state.voxel_keys[:2]))
    order = np.argsort(coords[:, 0])
    v0, v1 = order[0], order[1]  # v0 = (0,0,0), v1 = (1,0,0)
    ids0 = np.asarray(state.voxel_vertex_ids[v0])
    ids1 = np.asarray(state.voxel_vertex_ids[v1])
    # corner order: z fastest, x slowest; x+1 face of v0 == x+0 face of v1
    # corners 4..7 of v0 (x=1) must equal corners 0..3 of v1 (x=0)
    np.testing.assert_array_equal(ids0[4:8], ids1[0:4])
    # all ids distinct within a voxel
    assert len(set(ids0.tolist())) == 8


def test_insert_idempotent():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (100, 3)) * 2.0
    valid = jnp.ones((100,), bool)
    state1 = vh.insert_points(state, pts, valid, s)
    state2 = vh.insert_points(state1, pts, valid, s)
    assert int(state2.num_voxels) == int(state1.num_voxels)
    assert int(state2.num_cells) == int(state1.num_cells)
    np.testing.assert_array_equal(state1.voxel_keys, state2.voxel_keys)
    np.testing.assert_array_equal(
        state1.voxel_vertex_ids, state2.voxel_vertex_ids)


def test_incremental_insert_keeps_ids_stable():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    pts1 = jnp.array([[0.1, 0.1, 0.1]])
    pts2 = jnp.array([[0.9, 0.9, 0.9]])
    state1 = vh.insert_points(state, pts1, jnp.ones((1,), bool), s)
    ids_before = np.asarray(state1.voxel_vertex_ids[0])
    state2 = vh.insert_points(state1, pts2, jnp.ones((1,), bool), s)
    ids_after = np.asarray(state2.voxel_vertex_ids[0])
    np.testing.assert_array_equal(ids_before, ids_after)
    assert int(state2.num_voxels) == 2


def test_voxel_centers():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    pts = jnp.array([[0.1, 0.3, 0.5]])  # voxel (0, 1, 2)
    state = vh.insert_points(state, pts, jnp.ones((1,), bool), s)
    centers = vh.voxel_centers(state, s)
    np.testing.assert_allclose(centers[0], [0.1, 0.3, 0.5], atol=1e-6)


def test_negative_coords():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    pts = jnp.array([[-0.1, -0.3, -0.5]])  # voxel (-1, -2, -3)
    state = vh.insert_points(state, pts, jnp.ones((1,), bool), s)
    assert int(state.num_voxels) == 1
    centers = vh.voxel_centers(state, s)
    np.testing.assert_allclose(centers[0], [-0.1, -0.3, -0.5], atol=1e-6)


def test_insert_is_jittable():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    fn = jax.jit(vh.insert_points, static_argnums=(3,))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    state = fn(state, pts, jnp.ones((64,), bool), s)
    assert int(state.num_voxels) > 0


def test_lookup_cells():
    s = small_settings()
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    pts = jnp.array([[0.1, 0.1, 0.1]])
    state = vh.insert_points(state, pts, jnp.ones((1,), bool), s)
    found, ids = vh.lookup_cells(
        state, vh.pack_coords(jnp.array([[0, 0, 0], [5, 5, 5]])))
    assert bool(found[0]) and not bool(found[1])
    assert int(ids[1]) == -1


def test_insert_steady_capacity_self_heals():
    """Steady-state inserts with a small NEW-voxel budget: overflow is
    dropped but re-allocated on the next (re-)observation; existing
    voxels never consume budget."""
    import jax.numpy as jnp
    from proudslam_tpu.config import MapSettings
    from proudslam_tpu.ops import voxel_hash as vh

    s = MapSettings(voxel_size=0.2, num_embeddings=4096, embed_dim=4,
                    voxel_capacity=1024, frame_voxel_capacity=512)
    state = vh.init_map_state(s, jax.random.PRNGKey(0))
    # 40 distinct voxels; budget of 16 new per call
    import numpy as np
    coords = np.stack(np.meshgrid(np.arange(8), np.arange(5)),
                      -1).reshape(-1, 2)
    pts = np.concatenate([coords * 0.2 + 0.1,
                          np.full((40, 1), 0.3)], axis=1)
    pts_j = jnp.asarray(pts, jnp.float32)
    ones = jnp.ones((40,), bool)
    for i in range(4):
        state = vh.insert_points(state, pts_j, ones, s, frame_capacity=16)
        n = int(state.num_voxels)
        assert n == min(16 * (i + 1), 40), (i, n)
    # all allocated despite the per-call budget; vertex ids assigned
    assert int(state.num_voxels) == 40
    vids = np.asarray(state.voxel_vertex_ids[:40])
    assert (vids >= 0).all()
    # shared corners dedup to < 40*8 cells
    assert int(state.num_cells) < 320
