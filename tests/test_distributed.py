"""2-process `jax.distributed` smoke test on CPU (multi-host scaffolding).

Spawns two fresh Python processes, each with 4 virtual CPU devices,
initializes the JAX distributed runtime against a local coordinator
(`parallel/distributed.py`), builds the global (dp, mp) engine mesh over
all 8 devices, and runs a cross-process collective (a psum over a
globally-sharded array) — the standard JAX analog of a multi-host pod
(SURVEY §4). This validates the runtime path that `parallel/engine.py`'s
mesh rides on at multi-host scale.
"""

import socket
import subprocess
import sys

import pytest

CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

pid, n, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from proudslam_tpu.parallel import distributed
distributed.initialize(addr, n, pid)
assert jax.process_count() == n, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = distributed.global_engine_mesh(mp=2)
assert mesh.shape == {"dp": 4, "mp": 2}, mesh.shape

# global (8, 2) array sharded over dp: each process owns 4 rows
sharding = NamedSharding(mesh, P("dp", None))
global_shape = (8, 2)
def local_data(index):
    return np.arange(16, dtype=np.float32).reshape(global_shape)[index]
arr = jax.make_array_from_callback(global_shape, sharding, local_data)

# cross-process collective: sum over the sharded axis -> replicated
out = jax.jit(lambda x: jnp.sum(x, axis=0),
              out_shardings=NamedSharding(mesh, P()))(arr)
got = np.asarray(out.addressable_data(0))
np.testing.assert_allclose(got, np.arange(16).reshape(8, 2).sum(0))
print(f"proc{pid} OK {got.tolist()}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collective():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = {
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin",
    }
    import os
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
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc{pid} failed:\n{out}\n{err[-2000:]}"
        assert f"proc{pid} OK" in out, out
