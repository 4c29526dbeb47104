"""Mesh integration for the live SLAM engine.

`parallel/sharded.py` and `parallel/spatial.py` demonstrate the two
scale-out forms (GSPMD constraints, explicit shard_map collectives) on
standalone BA steps. This module wires the *production* engine —
`engine/tracker.py::track_frame` and `engine/mapper.py::map_step` as
driven by `engine/slam.py::SlamSystem` — onto a device mesh:

  * ``dp`` — the per-iteration ray batches (tracking: (N, ...) rays,
    mapping: (Wsel, N, ...) rays per window frame) are sharded over
    ``dp``; every loss reduction becomes an XLA ``psum`` over ICI.
  * ``mp`` — the vertex-embedding table is row-sharded (the map is the
    "model"); the trilinear gather's embedding lookups become GSPMD
    collectives, and the embedding gradient is reduce-scattered back to
    the owner shards by the all-gather transpose.

Everything is expressed as sharding constraints inside the already-jitted
step functions, so the same program text runs single-chip (``mesh=None``,
zero overhead) or on any (dp, mp) mesh — the TPU-native replacement for
the reference's two-process pipeline (`src/voxslam.py:53-74`, SURVEY §2.3),
which cannot scale past one GPU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_engine_mesh(n_devices: Optional[int] = None,
                     mp: int = 1) -> Mesh:
    """(dp, mp) mesh over the first ``n_devices`` devices.

    ``mp`` > 1 row-shards the embedding table in addition to the ray
    data-parallelism; ``n_devices`` must be divisible by ``mp``.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % mp == 0, (n, mp)
    arr = np.array(devices).reshape(n // mp, mp)
    return Mesh(arr, ("dp", "mp"))


def constrain(x: jax.Array, mesh: Optional[Mesh],
              spec: Sequence[Optional[str]]) -> jax.Array:
    """`with_sharding_constraint` under ``mesh``; identity when mesh=None."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def shard_ray_batch(mesh: Optional[Mesh], batch_dim: int, *arrays):
    """Constrain each array's ``batch_dim`` axis over the ``dp`` mesh axis
    (remaining axes replicated). Returns the arrays unchanged if mesh=None.
    """
    if mesh is None:
        return arrays
    out = []
    for a in arrays:
        spec = [None] * a.ndim
        spec[batch_dim] = "dp"
        out.append(constrain(a, mesh, spec))
    return tuple(out)


def shard_embeddings(mesh: Optional[Mesh], embeddings: jax.Array):
    """Row-shard the (E, D) vertex-embedding table over the ``mp`` axis."""
    if mesh is None:
        return embeddings
    return constrain(embeddings, mesh, ("mp", None))


def map_state_shardings(mesh: Mesh, map_state):
    """NamedSharding pytree for a MapState with the MAP ITSELF partitioned.

    Spatial scale-out in the production engine (SURVEY §2.3 "map-space
    sharding"): the embedding table, voxel table (keys + corner ids), the
    inverse vertex map and the cell table are all row-sharded over ``mp``
    so per-device map memory is O(V/mp + E/mp); counters replicate.
    Renderer-side gathers against the sharded tables become GSPMD
    collectives automatically; the embedding-gradient fold reduces back to
    the owner shards through the gather transpose.
    """
    row = NamedSharding(mesh, P("mp"))
    row2 = NamedSharding(mesh, P("mp", None))
    rep = NamedSharding(mesh, P())
    return type(map_state)(
        cell_keys=row, cell_ids=row, cell_vslot=row, num_cells=rep,
        voxel_keys=row, voxel_vertex_ids=row2, num_voxels=rep,
        embeddings=row2, inv_map=row2)


def place_map_state(mesh: Optional[Mesh], map_state):
    """Store a MapState spatially sharded on the mesh (no-op if mesh=None
    or the mesh has no model-parallel extent)."""
    if mesh is None or mesh.shape.get("mp", 1) <= 1:
        return map_state
    return jax.tree.map(jax.device_put, map_state,
                        map_state_shardings(mesh, map_state))
