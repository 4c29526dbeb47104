"""Device-resident SLAM state: keyframe store + per-keyframe pose optimizer.

The reference shuttles keyframes (full ``RGBDFrame`` modules with CUDA
tensors) through a 1-slot multiprocessing queue and per-property deep-copied
``ShareData`` snapshots (`src/share.py:27-165`, `src/voxslam.py:36`). Here
everything lives in fixed-capacity device arrays inside one program — the
"handoff" is just passing pytrees between jitted calls.

Keyframe protocol (mirrors `mapping.py:96-156` semantics):
  * every tracked frame is written to the *provisional* slot ``num_kf``
    (slot index managed host-side by the SLAM driver);
  * bundle adjustment optimizes a random window of committed keyframes plus
    the provisional slot;
  * the slot is committed (num_kf += 1 on the host) when
    ``stamp - stamp[num_kf-1] > keyframe_gap`` (reference: hardcoded 50);
  * slot 0 (stamp 0) is never pose-optimized (reference
    `render_helpers.py:594-596`).

Pose Adam moments are stored per slot and *seeded from the tracking loop's
final Adam state* — the reference pickles the tracker's optimizer along
with the frame and bundle adjustment keeps stepping it
(`tracking.py:150`, `render_helpers.py:594-600`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PoseAdamState(NamedTuple):
    m: jnp.ndarray   # (K, 6)
    v: jnp.ndarray   # (K, 6)
    t: jnp.ndarray   # (K,) int32 step counts


class KeyframeStore(NamedTuple):
    rgb: jnp.ndarray     # (K, H, W, 3) float32 in [0, 1]
    depth: jnp.ndarray   # (K, H, W) float32 meters (0 = invalid)
    stamps: jnp.ndarray  # (K,) int32 frame ids (-1 = empty)
    poses: jnp.ndarray   # (K, 6) SE(3) tangent [t, w]
    pose_adam: PoseAdamState


def init_keyframe_store(capacity: int, height: int, width: int) -> KeyframeStore:
    return KeyframeStore(
        rgb=jnp.zeros((capacity, height, width, 3), dtype=jnp.float32),
        depth=jnp.zeros((capacity, height, width), dtype=jnp.float32),
        stamps=jnp.full((capacity,), -1, dtype=jnp.int32),
        poses=jnp.zeros((capacity, 6), dtype=jnp.float32),
        pose_adam=PoseAdamState(
            m=jnp.zeros((capacity, 6), dtype=jnp.float32),
            v=jnp.zeros((capacity, 6), dtype=jnp.float32),
            t=jnp.zeros((capacity,), dtype=jnp.int32),
        ),
    )


def write_frame(store: KeyframeStore, slot: jnp.ndarray, rgb: jnp.ndarray,
                depth: jnp.ndarray, stamp: jnp.ndarray, pose: jnp.ndarray,
                adam_m: jnp.ndarray, adam_v: jnp.ndarray,
                adam_t: jnp.ndarray) -> KeyframeStore:
    """Write a tracked frame into a slot (jittable; slot may be traced)."""
    return store._replace(
        rgb=store.rgb.at[slot].set(rgb),
        depth=store.depth.at[slot].set(depth),
        stamps=store.stamps.at[slot].set(stamp),
        poses=store.poses.at[slot].set(pose),
        pose_adam=PoseAdamState(
            m=store.pose_adam.m.at[slot].set(adam_m),
            v=store.pose_adam.v.at[slot].set(adam_v),
            t=store.pose_adam.t.at[slot].set(adam_t),
        ),
    )
