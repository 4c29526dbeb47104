import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import RenderSettings
from proudslam_tpu.ops.intersect import (
    ray_box_slab, ray_intersect, ray_intersect_scan)


SET = RenderSettings(voxel_size=0.2, step_size=0.02, max_hits=8,
                     max_samples=40, max_distance=10.0)


def test_slab_basic_hit():
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    c = jnp.array([[0.0, 0.0, 0.0]])
    tn, tf, hit = ray_box_slab(o, d, c, 0.1)
    assert bool(hit[0, 0])
    np.testing.assert_allclose(tn[0, 0], 0.9, atol=1e-6)
    np.testing.assert_allclose(tf[0, 0], 1.1, atol=1e-6)


def test_slab_miss():
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    c = jnp.array([[1.0, 0.0, 0.0]])
    _, _, hit = ray_box_slab(o, d, c, 0.1)
    assert not bool(hit[0, 0])


def test_slab_origin_inside_clamps_to_zero():
    # reference f_low starts at 0 (`intersect_gpu.cu:82`)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    c = jnp.array([[0.0, 0.0, 0.0]])
    tn, tf, hit = ray_box_slab(o, d, c, 0.1)
    assert bool(hit[0, 0])
    np.testing.assert_allclose(tn[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(tf[0, 0], 0.1, atol=1e-6)


def test_intersect_sorted_by_depth():
    # three voxels along +z at increasing depth, scrambled order
    centers = jnp.array([
        [0.0, 0.0, 2.0], [0.0, 0.0, 0.5], [0.0, 0.0, 1.2]])
    valid = jnp.ones((3,), bool)
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = ray_intersect(o, d, centers, valid, SET)
    idx = np.asarray(out.voxel_idx[0])
    assert list(idx[:3]) == [1, 2, 0]
    tn = np.asarray(out.t_near[0])
    assert np.all(np.diff(tn[:3]) > 0)
    assert np.all(idx[3:] == -1)
    assert bool(out.hit_mask[0])


def test_intersect_respects_max_distance():
    centers = jnp.array([[0.0, 0.0, 50.0]])
    out = ray_intersect(jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]),
                        centers, jnp.ones((1,), bool), SET)
    assert not bool(out.hit_mask[0])


def test_intersect_ignores_invalid_voxels():
    centers = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
    valid = jnp.array([True, False])
    out = ray_intersect(jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]),
                        centers, valid, SET)
    idx = np.asarray(out.voxel_idx[0])
    assert idx[0] == 0 and np.all(idx[1:] == -1)


def test_intersect_matches_bruteforce_reference():
    """Property test mirroring the reference's own octree-vs-AABB
    cross-check (`src/variations/test_aabb.py`)."""
    rng = np.random.default_rng(0)
    centers = (rng.integers(-5, 5, size=(64, 3)) + 0.5) * 0.2
    centers = np.unique(centers, axis=0)
    V = centers.shape[0]
    o = rng.uniform(-1.5, 1.5, size=(16, 3)).astype(np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    out = ray_intersect(jnp.asarray(o), jnp.asarray(d),
                        jnp.asarray(centers, jnp.float32),
                        jnp.ones((V,), bool), SET, exact=True)
    # brute force in numpy
    half = 0.1
    for r in range(16):
        hits = []
        for vi in range(V):
            lo = (centers[vi] - half - o[r]) / d[r]
            hi = (centers[vi] + half - o[r]) / d[r]
            t1, t2 = np.minimum(lo, hi), np.maximum(lo, hi)
            tn, tf = max(t1.max(), 0.0), t2.min()
            if tn <= tf and tn <= SET.max_distance:
                hits.append((tn, vi, tf))
        hits.sort()
        expect = hits[:SET.max_hits]
        got_idx = [i for i in np.asarray(out.voxel_idx[r]) if i >= 0]
        assert got_idx == [h[1] for h in expect], f"ray {r}"
        got_tn = np.asarray(out.t_near[r])[:len(expect)]
        np.testing.assert_allclose(
            got_tn, [h[0] for h in expect], atol=1e-4)


def test_scan_variant_matches_default():
    """The chunked-scan oracle and the fused approx_min_k path agree
    (the analog of the reference's octree-vs-AABB check, `test_aabb.py`)."""
    rng = np.random.default_rng(3)
    centers = (rng.integers(-6, 6, size=(200, 3)) + 0.5) * 0.2
    centers = np.unique(centers, axis=0).astype(np.float32)
    V = centers.shape[0]
    o = rng.uniform(-1.0, 1.0, size=(32, 3)).astype(np.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    a = ray_intersect(jnp.asarray(o), jnp.asarray(d), jnp.asarray(centers),
                      jnp.ones((V,), bool), SET)
    b = ray_intersect_scan(jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(centers), jnp.ones((V,), bool), SET,
                           chunk=64)
    np.testing.assert_array_equal(np.asarray(a.voxel_idx),
                                  np.asarray(b.voxel_idx))
    np.testing.assert_allclose(np.asarray(a.t_near), np.asarray(b.t_near),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.t_far), np.asarray(b.t_far),
                               atol=1e-5)


class _Map:
    """Minimal (voxel_keys, num_voxels) holder for the DDA path."""

    def __init__(self, coords, capacity=512):
        from proudslam_tpu.ops import voxel_hash as vh
        coords = np.unique(np.asarray(coords, np.int64), axis=0)
        keys = np.asarray(vh.pack_coords(jnp.asarray(coords, jnp.int32)))
        order = np.argsort(keys)  # arbitrary but fixed slot order
        k = np.full((capacity,), 2**31 - 1, np.int32)
        k[:len(keys)] = keys[order]
        self.voxel_keys = jnp.asarray(k)
        self.num_voxels = jnp.int32(len(keys))
        self.coords = coords[order]


DDA_SET = RenderSettings(voxel_size=0.2, step_size=0.02, max_hits=8,
                         max_samples=40, max_distance=10.0,
                         grid_dims=(64, 64, 64),
                         grid_origin=(-32, -32, -32))


def _centers_valid(m):
    from proudslam_tpu.ops.voxel_hash import unpack_key
    centers = (unpack_key(m.voxel_keys).astype(jnp.float32) + 0.5) * 0.2
    valid = jnp.arange(m.voxel_keys.shape[0]) < m.num_voxels
    return centers, valid


def test_dda_matches_scan_oracle_random():
    """Property test: grid-DDA == exact brute-force scan, up to corner
    grazes (chord < march spacing) — the analog of the reference's own
    octree-vs-AABB cross-check (`src/variations/test_aabb.py`)."""
    from proudslam_tpu.ops.intersect import ray_intersect_dda

    rng = np.random.default_rng(3)
    coords = rng.integers(-14, 14, size=(400, 3))
    m = _Map(coords)
    centers, valid = _centers_valid(m)

    R = 128
    o = rng.normal(0, 0.5, (R, 3)).astype(np.float32)
    d = rng.normal(0, 1.0, (R, 3)).astype(np.float32)
    d = d / np.maximum(np.abs(d[:, 2:3]), 0.2)  # pinhole-ish, |d| bounded
    d = np.clip(d, -1.2, 1.2)
    o, d = jnp.asarray(o), jnp.asarray(d)

    got = ray_intersect_dda(o, d, m.voxel_keys, m.num_voxels, DDA_SET)
    want = ray_intersect_scan(o, d, centers, valid, DDA_SET)

    graze = 0
    for r in range(R):
        wi = [int(v) for v in np.asarray(want.voxel_idx[r]) if v >= 0]
        gi = [int(v) for v in np.asarray(got.voxel_idx[r]) if v >= 0]
        # brute may have been truncated at max_hits: compare the common
        # prefix length
        n = min(len(wi), DDA_SET.max_hits)
        missing = [v for v in wi[:n] if v not in gi]
        for v in missing:
            k = wi.index(v)
            chord = float(want.t_far[r, k] - want.t_near[r, k]) * float(
                jnp.linalg.norm(d[r]))
            assert chord < 0.45 * 0.2 + 1e-5, (r, v, chord)
            graze += 1
        # every DDA hit must be a real hit with matching depths
        for k, v in enumerate(gi):
            if v in wi:
                kw = wi.index(v)
                np.testing.assert_allclose(got.t_near[r, k],
                                           want.t_near[r, kw], atol=1e-4)
                np.testing.assert_allclose(got.t_far[r, k],
                                           want.t_far[r, kw], atol=1e-4)
        # DDA output is sorted by entry depth
        tn = np.asarray(got.t_near[r])[:len(gi)]
        assert np.all(np.diff(tn) >= -1e-5), tn
    # grazes should be rare
    assert graze < 0.02 * R * DDA_SET.max_hits, graze


def test_dda_wall_straight_on():
    from proudslam_tpu.ops.intersect import ray_intersect_dda

    # a 5x5 wall of voxels at z-coord 5 (centers z=1.1)
    xs, ys = np.meshgrid(np.arange(-2, 3), np.arange(-2, 3))
    coords = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 5)], -1)
    m = _Map(coords)
    o = jnp.zeros((1, 3))
    d = jnp.array([[0.0, 0.0, 1.0]])
    got = ray_intersect_dda(o, d, m.voxel_keys, m.num_voxels, DDA_SET)
    assert bool(got.hit_mask[0])
    assert int(got.voxel_idx[0, 0]) >= 0
    np.testing.assert_allclose(got.t_near[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(got.t_far[0, 0], 1.2, atol=1e-5)
    assert int(got.voxel_idx[0, 1]) == -1


def test_dda_origin_inside_voxel():
    from proudslam_tpu.ops.intersect import ray_intersect_dda

    m = _Map(np.array([[0, 0, 0]]))
    o = jnp.array([[0.1, 0.1, 0.1]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    got = ray_intersect_dda(o, d, m.voxel_keys, m.num_voxels, DDA_SET)
    assert bool(got.hit_mask[0])
    np.testing.assert_allclose(got.t_near[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(got.t_far[0, 0], 0.1, atol=1e-6)


def test_dda_respects_max_hits_order():
    from proudslam_tpu.ops.intersect import ray_intersect_dda

    # a corridor of 20 voxels along +z; only the first 8 fit in max_hits
    coords = np.stack([np.zeros(20, int), np.zeros(20, int),
                       np.arange(3, 23)], -1)
    m = _Map(coords)
    o = jnp.array([[0.05, 0.05, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    got = ray_intersect_dda(o, d, m.voxel_keys, m.num_voxels, DDA_SET)
    idx = np.asarray(got.voxel_idx[0])
    assert np.all(idx >= 0)
    tn = np.asarray(got.t_near[0])
    np.testing.assert_allclose(tn, 0.6 + 0.2 * np.arange(8), atol=1e-5)
