import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import RenderSettings
from proudslam_tpu.ops.intersect import Intersections
from proudslam_tpu.ops.sampling import sample_frame_pixels, sample_rays_in_segments


SET = RenderSettings(voxel_size=0.2, step_size=0.05, max_hits=4,
                     max_samples=24, max_distance=10.0)


def make_inter(t_near, t_far, idx):
    H = SET.max_hits
    R = len(t_near)

    def pad(rows, fill):
        return jnp.asarray([list(r) + [fill] * (H - len(r)) for r in rows],
                           jnp.float32)

    tn = pad(t_near, SET.max_distance)
    tf = pad(t_far, SET.max_distance)
    ix = jnp.asarray([list(r) + [-1] * (H - len(r)) for r in idx], jnp.int32)
    hit = ix[:, 0] >= 0
    return Intersections(t_near=tn, t_far=tf, voxel_idx=ix, hit_mask=hit)


def deterministic_noise(R):
    return jnp.full((R, SET.max_samples - SET.max_hits), 0.5)


def test_single_segment_uniform_steps():
    inter = make_inter([[1.0]], [[1.2]], [[7]])
    s = sample_rays_in_segments(inter, SET, deterministic_noise(1))
    idx = np.asarray(s.voxel_idx[0])
    valid = idx >= 0
    # segment length 0.2, step 0.05 -> 4 jittered samples + 1 boundary
    assert valid.sum() == 5
    assert np.all(idx[valid] == 7)
    depths = np.asarray(s.depth[0])[valid]
    # z positions: 0.5-jitter -> z = 1.0 + [0.025, 0.075, 0.125, 0.175], then
    # boundary z=1.2; midpoints between consecutive z (z_low starts at 1.0)
    z = np.array([1.025, 1.075, 1.125, 1.175, 1.2])
    z_lo = np.array([1.0, 1.025, 1.075, 1.125, 1.175])
    np.testing.assert_allclose(depths, (z + z_lo) / 2, atol=1e-5)
    dists = np.asarray(s.dist[0])[valid]
    np.testing.assert_allclose(dists, z - z_lo, atol=1e-5)


def test_two_segments_with_gap():
    inter = make_inter([[1.0, 2.0]], [[1.1, 2.1]], [[3, 5]])
    s = sample_rays_in_segments(inter, SET, deterministic_noise(1))
    idx = np.asarray(s.voxel_idx[0])
    valid = idx >= 0
    # total length 0.2 -> 4 jittered + 2 boundary samples
    assert valid.sum() == 6
    # first three samples in voxel 3, last three in voxel 5
    assert list(idx[valid]) == [3, 3, 3, 5, 5, 5]
    depths = np.asarray(s.depth[0])[valid]
    # no sample's distance spans the inter-voxel gap
    dists = np.asarray(s.dist[0])[valid]
    assert np.all(dists < 0.11)
    # depths are monotonically increasing
    assert np.all(np.diff(depths) > 0)


def test_invalid_ray_all_masked():
    inter = make_inter([[]], [[]], [[]])
    s = sample_rays_in_segments(inter, SET, deterministic_noise(1))
    assert np.all(np.asarray(s.voxel_idx[0]) == -1)
    assert np.all(np.asarray(s.dist[0]) == 0.0)
    assert np.all(np.asarray(s.depth[0]) == SET.max_depth_sentinel)


def test_dists_cover_segments():
    # sum of dists == total intersected length (within step quantization)
    inter = make_inter([[0.5, 1.0, 3.0]], [[0.8, 1.4, 3.3]], [[0, 1, 2]])
    key = jax.random.PRNGKey(0)
    noise = jax.random.uniform(key, (1, SET.max_samples - SET.max_hits))
    s = sample_rays_in_segments(inter, SET, noise)
    total = 0.3 + 0.4 + 0.3
    np.testing.assert_allclose(np.asarray(s.dist[0]).sum(), total, atol=1e-4)


def test_sample_frame_pixels_distinct_and_valid():
    key = jax.random.PRNGKey(1)
    mask = jnp.ones((32 * 24,))
    idx = np.asarray(sample_frame_pixels(key, mask, 64))
    assert len(set(idx.tolist())) == 64
    assert idx.min() >= 0 and idx.max() < 32 * 24


def test_sample_frame_pixels_respects_mask():
    key = jax.random.PRNGKey(2)
    mask = jnp.zeros((100,)).at[10:20].set(1.0)
    idx = np.asarray(sample_frame_pixels(key, mask, 8))
    assert np.all((idx >= 10) & (idx < 20))


def test_sortfree_matches_sort_oracle():
    """The rank-merge sampler must match the jnp.sort formulation exactly."""
    import numpy as np
    from proudslam_tpu.config import RenderSettings
    from proudslam_tpu.ops.intersect import Intersections
    from proudslam_tpu.ops.sampling import (
        sample_rays_in_segments, sample_rays_in_segments_sort)

    rng = np.random.default_rng(7)
    for adaptive in (True, False):
        s = RenderSettings(voxel_size=0.2, step_size=0.05, max_hits=6,
                           max_samples=30, max_distance=10.0,
                           adaptive_step=adaptive)
        R, H = 64, 6
        # random sorted non-overlapping segments; some rays fully invalid,
        # some segments zero-length
        t0 = np.sort(rng.uniform(0.2, 5.0, (R, H)), axis=1)
        ln = rng.uniform(0.0, 0.4, (R, H))
        ln[rng.random((R, H)) < 0.2] = 0.0
        nvalid = rng.integers(0, H + 1, (R,))
        vidx = np.where(np.arange(H)[None, :] < nvalid[:, None],
                        rng.integers(0, 100, (R, H)), -1)
        tn = np.where(vidx >= 0, t0, s.max_distance)
        tf = np.where(vidx >= 0, t0 + ln, s.max_distance)
        inter = Intersections(
            t_near=jnp.asarray(tn, jnp.float32),
            t_far=jnp.asarray(tf, jnp.float32),
            voxel_idx=jnp.asarray(vidx, jnp.int32),
            hit_mask=jnp.asarray(nvalid > 0))
        noise = jnp.asarray(rng.uniform(0.01, 0.99, (R, s.max_samples - H)),
                            jnp.float32)
        a = sample_rays_in_segments(inter, s, noise)
        b = sample_rays_in_segments_sort(inter, s, noise)
        np.testing.assert_array_equal(np.asarray(a.voxel_idx),
                                      np.asarray(b.voxel_idx))
        np.testing.assert_array_equal(np.asarray(a.bin), np.asarray(b.bin))
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.dist), np.asarray(b.dist),
                                   atol=1e-5)
