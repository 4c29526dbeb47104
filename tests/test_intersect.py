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
