"""Multi-host runtime scaffolding: `jax.distributed` initialization.

The reference's "distributed backend" is torch.multiprocessing pickle-RPC
on one machine (`src/share.py`, `src/voxslam.py:28-36`, SURVEY §2.3/§5) —
it cannot span hosts. The TPU-native equivalent is one SPMD program over
all hosts' devices: each process calls :func:`initialize` once, after
which ``jax.devices()`` is the *global* device list, a ``Mesh`` built over
it spans hosts, and XLA routes collectives over ICI within a host and DCN
across hosts. The engine-level sharding (`parallel/engine.py`) is
placement-agnostic — the same (dp, mp) mesh works single-host or
multi-host once this module has initialized the runtime.

Tested with 2 CPU processes (the standard JAX multi-host fake backend) in
`tests/test_distributed.py`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime for this process.

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); on TPU pods all three are auto-detected by JAX
    and may be omitted entirely.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_engine_mesh(mp: int = 1):
    """(dp, mp) mesh over ALL processes' devices (call after initialize).

    Device order follows ``jax.devices()`` (process-major), so with P
    processes x L local devices and ``mp <= L``, each (dp row, mp group)
    stays within one host — embedding all-gathers ride ICI, only the dp
    gradient psum crosses DCN (the hierarchy `parallel/spatial.py`'s
    docstring prescribes).
    """
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    assert n % mp == 0, (n, mp)
    return Mesh(np.array(devices).reshape(n // mp, mp), ("dp", "mp"))


def is_initialized() -> bool:
    try:
        return jax.process_count() >= 1 and \
            jax._src.distributed.global_state.client is not None
    except Exception:
        return False
