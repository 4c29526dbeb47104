"""PRODUCTION SLAM steps across process boundaries (multi-host analog).

`test_distributed.py` validates the runtime bring-up with a bare psum;
this test runs the *production* `track_frame` and `map_step` — the same
functions `SlamSystem` jits — over a (dp=4, mp=2) mesh spanning TWO
OS processes (4 virtual CPU devices each, the standard JAX multi-host
fake backend), and asserts the results match a local single-device
execution of the same step. Ray batches shard over dp across the process
boundary (the loss psum crosses the "DCN"), the embedding table row-
shards over mp. This is the load-bearing multi-host claim of the
replacement for the reference's single-machine pickle-RPC fabric
(`src/share.py:27-165`, `src/voxslam.py:28-36`).
"""

import socket
import subprocess
import sys

import pytest

CHILD = r"""
import sys
import functools
import jax
jax.config.update("jax_platforms", "cpu")

pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from proudslam_tpu.parallel import distributed
distributed.initialize(addr, n, pid)
assert jax.process_count() == n
assert jax.device_count() == 8

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from proudslam_tpu.config import (
    DecoderSettings, LossSettings, MapSettings, MapperSettings,
    RenderSettings, SystemSettings, TrackerSettings)
from proudslam_tpu.data.synthetic import SyntheticDataset
from proudslam_tpu.engine import state as kfstate
from proudslam_tpu.engine.mapper import init_map_opt, map_step
from proudslam_tpu.engine.tracker import track_frame
from proudslam_tpu.geometry import camera, se3
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh

settings = SystemSettings(
    render=RenderSettings(voxel_size=0.2, step_size=0.05, truncation=0.1,
                          max_distance=10.0, max_hits=8, max_samples=48),
    map=MapSettings(voxel_size=0.2, num_embeddings=4096, embed_dim=16,
                    voxel_capacity=2048, frame_voxel_capacity=1024),
    decoder=DecoderSettings(depth=2, width=64, in_dim=16, sdf_dim=64),
    tracker=TrackerSettings(n_rays=256, num_iterations=5,
                            learning_rate=0.01),
    mapper=MapperSettings(n_rays_each=256, window_size=1, num_iterations=3,
                          max_keyframes=4),
    loss=LossSettings(),
)

ds = SyntheticDataset(num_frames=3, width=64, height=48)
H, W = ds.height, ds.width
fx, fy, cx, cy = ds.intrinsics
rays_dir = camera.pixel_ray_directions(W, H, fx, fy, cx, cy)

# map from frame 0's backprojected depth at its gt pose
_, rgb0, depth0, _, pose0 = ds[0]
p0 = np.asarray(se3.tangent_from_matrix(jnp.asarray(pose0)))
pts_cam = np.asarray(camera.backproject(
    rays_dir, jnp.asarray(depth0))).reshape(-1, 3)
R0 = np.asarray(se3.exp_rotation(jnp.asarray(p0[3:6])))
pts_w = pts_cam @ R0.T + p0[0:3]
coords = np.unique(np.floor(pts_w / 0.2).astype(np.int64), axis=0)
state = vh.build_map_state_numpy(coords, settings.map)

dec = init_decoder(jax.random.PRNGKey(1), settings.decoder)
key = jax.random.PRNGKey(2)
_, rgb1, depth1, _, pose1 = ds[1]

store = kfstate.init_keyframe_store(settings.mapper.max_keyframes, H, W)
store = store._replace(
    rgb=store.rgb.at[0].set(jnp.asarray(rgb0, jnp.float32))
                  .at[1].set(jnp.asarray(rgb1, jnp.float32)),
    depth=store.depth.at[0].set(jnp.asarray(depth0, jnp.float32))
                    .at[1].set(jnp.asarray(depth1, jnp.float32)),
    poses=store.poses.at[0].set(jnp.asarray(p0))
                    .at[1].set(se3.tangent_from_matrix(jnp.asarray(pose1))),
    stamps=store.stamps.at[0].set(0).at[1].set(1),
)
opt = init_map_opt(state.embeddings, dec)
sel = jnp.arange(2, dtype=jnp.int32)
valid = jnp.ones((2,), bool)

# ---- golden: local single-device execution ----
t_loc = jax.jit(functools.partial(
    track_frame, settings=settings, mesh=None))(
        state, dec, jnp.asarray(p0), rays_dir,
        jnp.asarray(rgb1, jnp.float32), jnp.asarray(depth1, jnp.float32),
        key)
m_loc = jax.jit(functools.partial(
    map_step, settings=settings, mesh=None))(
        state, dec, store, opt, rays_dir, sel, valid, key)
g_pose = np.asarray(t_loc.pose)
g_tloss = float(t_loc.loss)
g_mloss = float(m_loc.loss)
g_emb = np.asarray(m_loc.map_state.embeddings)

# ---- distributed: global (dp=4, mp=2) mesh across both processes ----
mesh = distributed.global_engine_mesh(mp=2)
assert mesh.shape == {"dp": 4, "mp": 2}
rep = NamedSharding(mesh, P())

def to_global(tree):
    def conv(x):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, rep, lambda idx: a[idx])
    return jax.tree.map(conv, tree)

(state_g, dec_g, store_g, opt_g, rays_g, rgb_g, depth_g, key_g, p0_g,
 sel_g, valid_g) = to_global(
    (state, dec, store, opt, rays_dir,
     jnp.asarray(rgb1, jnp.float32), jnp.asarray(depth1, jnp.float32),
     key, jnp.asarray(p0), sel, valid))

t_fn = jax.jit(functools.partial(track_frame, settings=settings, mesh=mesh))
t_dist = t_fn(state_g, dec_g, p0_g, rays_g, rgb_g, depth_g, key_g)
m_fn = jax.jit(functools.partial(map_step, settings=settings, mesh=mesh))
m_dist = m_fn(state_g, dec_g, store_g, opt_g, rays_g, sel_g, valid_g, key_g)

# cross-process execution really happened over all 8 devices
assert len(t_dist.pose.sharding.device_set) == 8
assert len(m_dist.map_state.embeddings.sharding.device_set) == 8

d_pose = np.asarray(t_dist.pose.addressable_data(0))
d_tloss = float(np.asarray(t_dist.loss.addressable_data(0)))
d_mloss = float(np.asarray(m_dist.loss.addressable_data(0)))
emb_shards = m_dist.map_state.embeddings

np.testing.assert_allclose(d_pose, g_pose, atol=2e-4)
assert abs(d_tloss - g_tloss) < 1e-3 * max(abs(g_tloss), 1.0)
assert abs(d_mloss - g_mloss) < 1e-3 * max(abs(g_mloss), 1.0)

# embedding rows owned by this process match the golden table
for shard in emb_shards.addressable_shards:
    sl = shard.index
    np.testing.assert_allclose(np.asarray(shard.data), g_emb[sl], atol=5e-3)

print(f"proc{pid} OK track_loss={d_tloss:.5f} map_loss={d_mloss:.5f}",
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_production_steps_across_two_processes():
    import os
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = {
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin",
    }
    for k in ("PYTHONPATH", "HOME", "LD_LIBRARY_PATH"):
        if k in os.environ:
            env[k] = os.environ[k]
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(pid), "2", addr],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost SLAM child timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc{pid} failed:\n{out}\n{err[-3000:]}"
        assert f"proc{pid} OK" in out, out
