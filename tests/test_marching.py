import numpy as np

from proudslam_tpu.ops.marching import TET_TABLE, marching_tets


def test_tet_table_structure():
    # empty cases produce nothing
    assert (TET_TABLE[0] == -1).all()
    assert (TET_TABLE[15] == -1).all()
    for case in range(1, 15):
        n_neg = bin(case).count("1")
        tris = (TET_TABLE[case, :, 0] >= 0).sum()
        assert tris == (2 if n_neg == 2 else 1)


def sphere_grid(center, radius, vox_centers, res, voxel_size):
    lin = np.linspace(-0.5, 0.5, res) * voxel_size
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    local = np.stack([gx, gy, gz], -1)
    pts = vox_centers[:, None, None, None, :] + local[None]
    return np.linalg.norm(pts - center, axis=-1) - radius


def test_sphere_surface():
    """Extract a sphere isosurface; vertices must lie on the sphere."""
    voxel_size = 0.25
    radius = 0.4
    rng = range(-3, 3)
    centers = np.array([[(i + 0.5) * voxel_size, (j + 0.5) * voxel_size,
                         (k + 0.5) * voxel_size]
                        for i in rng for j in rng for k in rng],
                       dtype=np.float32)
    sdf = sphere_grid(np.zeros(3), radius, centers, 8, voxel_size)
    verts, faces = marching_tets(sdf, centers, voxel_size, chunk=64)
    assert len(verts) > 100
    assert len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, radius, atol=0.02)
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_sphere_normals_point_outward():
    voxel_size = 0.25
    radius = 0.4
    rng = range(-3, 3)
    centers = np.array([[(i + 0.5) * voxel_size, (j + 0.5) * voxel_size,
                         (k + 0.5) * voxel_size]
                        for i in rng for j in rng for k in rng],
                       dtype=np.float32)
    sdf = sphere_grid(np.zeros(3), radius, centers, 8, voxel_size)
    verts, faces = marching_tets(sdf, centers, voxel_size, chunk=64)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centroid = tri.mean(axis=1)
    outward = (n * centroid).sum(-1)
    # orientation flip aligns normals with the SDF gradient (outward)
    assert (outward > 0).mean() > 0.99


def test_no_surface_returns_empty():
    centers = np.zeros((4, 3), np.float32)
    sdf = np.ones((4, 8, 8, 8), np.float32)
    verts, faces = marching_tets(sdf, centers, 0.2)
    assert len(verts) == 0 and len(faces) == 0


def test_watertight_euler_characteristic():
    """A sphere mesh should be closed: V - E + F == 2 (genus 0)."""
    voxel_size = 0.5
    rng = range(-2, 2)
    centers = np.array([[(i + 0.5) * voxel_size, (j + 0.5) * voxel_size,
                         (k + 0.5) * voxel_size]
                        for i in rng for j in rng for k in rng],
                       dtype=np.float32)
    sdf = sphere_grid(np.zeros(3), 0.55, centers, 9, voxel_size)
    verts, faces = marching_tets(sdf, centers, voxel_size, chunk=64)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    edges = np.sort(edges, axis=-1)
    uniq_edges = np.unique(edges, axis=0)
    euler = len(verts) - len(uniq_edges) + len(faces)
    assert euler == 2, euler
