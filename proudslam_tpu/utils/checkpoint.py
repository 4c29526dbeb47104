"""Checkpoint / resume for the full SLAM state.

The reference only *saves* (`BasicLogger.log_ckpt`, `loggers.py:36-47`:
decoder state_dict + map_states + embeddings + pickled octree); its
``--resume`` flag is parsed but never consumed (SURVEY.md §5). Here both
directions work: every device array (map state, decoder params, optimizer
moments, keyframe store) plus the host-side bookkeeping round-trips through
one ``.npz`` + JSON sidecar, restoring a byte-identical SLAM state.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from proudslam_tpu.engine.slam import SlamSystem


def _flatten_state(slam: "SlamSystem"):
    # last_pose6 is None before initialize(); use a zeros placeholder so the
    # tree structure is identical for fresh and initialized systems
    last = (slam.last_pose6 if slam.last_pose6 is not None
            else jnp.zeros((6,), jnp.float32))
    pytree = {
        "map_state": slam.map_state,
        "decoder_params": slam.decoder_params,
        "opt": slam.opt,
        "store": slam.store,
        "last_pose6": last,
    }
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    return leaves, treedef, pytree


def _base(path: str) -> str:
    return path[:-4] if path.endswith(".npz") else path


def save_checkpoint(path: str, slam: "SlamSystem") -> None:
    leaves, _, _ = _flatten_state(slam)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(_base(path) + ".npz", **arrays)
    meta = {
        "num_kf": slam.num_kf,
        "kf_stamps": slam.kf_stamps,
        "frame_poses": [
            (int(ref), np.asarray(rel).tolist())
            for ref, rel in slam.frame_poses],
        "num_leaves": len(leaves),
    }
    with open(_base(path) + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, slam: "SlamSystem") -> "SlamSystem":
    """Restore state saved by :func:`save_checkpoint` into ``slam``
    (which must have been constructed with identical settings)."""
    _, treedef, _ = _flatten_state(slam)
    data = np.load(_base(path) + ".npz")
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    pytree = jax.tree_util.tree_unflatten(treedef, leaves)
    slam.map_state = pytree["map_state"]
    slam.decoder_params = pytree["decoder_params"]
    slam.opt = pytree["opt"]
    slam.store = pytree["store"]
    slam.last_pose6 = pytree["last_pose6"]
    with open(_base(path) + ".meta.json") as f:
        meta = json.load(f)
    slam.num_kf = meta["num_kf"]
    slam.kf_stamps = list(meta["kf_stamps"])
    slam.frame_poses = [
        (ref, np.asarray(rel)) for ref, rel in meta["frame_poses"]]
    return slam
