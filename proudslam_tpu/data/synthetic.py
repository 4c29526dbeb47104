"""Synthetic RGB-D sequence generator (ground-truth oracle).

The reference's datasets (Replica/ScanNet/ARKit) are disk-based captures we
cannot ship; for tests and benchmarks we ray-march an analytic SDF scene
(a box room containing spheres) to produce pixel-perfect RGB-D frames with
known poses. Serves the role the Replica 200-frame clip plays in
BASELINE.json config 1, and doubles as a golden oracle: SLAM output can be
compared against exact geometry and trajectory.

Pure numpy, host-side; generate once and cache.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class SyntheticScene:
    room_center: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, 0.0]))
    room_half: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([2.0, 1.5, 2.0]))
    sphere_centers: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([
            [0.6, 0.4, 0.8], [-0.7, -0.3, -0.5], [0.0, 0.6, -0.9]]))
    sphere_radii: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.35, 0.45, 0.3]))

    def sdf(self, p: np.ndarray) -> np.ndarray:
        """(N, 3) -> (N,) signed distance; negative inside solid matter.

        The room is hollow: solid = outside the box OR inside a sphere, so
        the SDF seen from inside the room is distance-to-nearest-wall /
        sphere surface.
        """
        q = np.abs(p - self.room_center) - self.room_half
        # inside-room distance to walls (positive inside the hollow room)
        wall = -np.max(q, axis=-1)
        spheres = np.linalg.norm(
            p[:, None, :] - self.sphere_centers[None], axis=-1
        ) - self.sphere_radii[None]
        return np.minimum(wall, spheres.min(axis=-1))

    def albedo(self, p: np.ndarray) -> np.ndarray:
        """Smooth procedural RGB albedo in [0.05, 0.95]."""
        phases = np.array([[0.0, 2.1, 4.2]])
        freq = np.array([[2.0], [2.6], [3.2]])
        vals = np.stack([
            np.sin(freq[c, 0] * p[:, c % 3] + phases[0, c]) for c in range(3)
        ], axis=-1)
        return 0.5 + 0.45 * vals * np.cos(1.7 * p[:, ::-1])


def _ray_march(scene: SyntheticScene, origins: np.ndarray, dirs: np.ndarray,
               max_depth: float = 12.0, iters: int = 128) -> np.ndarray:
    """Sphere-trace along (unit-norm scaled) dirs; returns hit parameter t
    (in units of the *given* dirs, i.e. camera z-depth for pinhole dirs)."""
    norms = np.linalg.norm(dirs, axis=-1, keepdims=True)
    unit = dirs / norms
    t = np.full(origins.shape[0], 1e-3)
    alive = np.ones(origins.shape[0], dtype=bool)
    for _ in range(iters):
        p = origins + unit * t[:, None]
        d = scene.sdf(p)
        t = np.where(alive, t + np.maximum(d, 1e-5) * 0.9, t)
        alive = alive & (np.abs(d) > 1e-4) & (t < max_depth)
        if not alive.any():
            break
    hit = t < max_depth
    # convert from euclidean distance to z-depth units of the input dirs
    z = t / norms[:, 0]
    return np.where(hit, z, 0.0)


def look_poses(num_frames: int, step: float = 0.012) -> List[np.ndarray]:
    """Smooth camera trajectory inside the room: gentle arc + slow yaw.

    Per-frame motion is ~``step`` meters (default 1.2 cm) with ~0.3 deg of
    yaw — matching the inter-frame motion of real RGB-D captures (Replica
    sequences move ~1-2 cm/frame), which is the scale SLAM tracking's
    constant-position motion model assumes.

    Returns world-from-camera 4x4s (camera: x right, y down, z forward).
    """
    poses = []
    for i in range(num_frames):
        t = i * step
        yaw = 0.35 * t
        pos = np.array([
            0.8 * t,
            0.05 * np.sin(2.0 * t),
            -1.2 + 0.55 * t,
        ])
        c, si = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, si], [0, 1, 0], [-si, 0, c]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        poses.append(T)
    return poses


def render_frame(scene: SyntheticScene, pose: np.ndarray,
                 width: int, height: int,
                 fx: float, fy: float, cx: float, cy: float,
                 max_depth: float = 12.0) -> Tuple[np.ndarray, np.ndarray]:
    """-> (rgb (H, W, 3) in [0,1], depth (H, W) meters, 0 invalid)."""
    ix, iy = np.meshgrid(np.arange(width), np.arange(height))
    dirs_cam = np.stack([(ix - cx) / fx, (iy - cy) / fy,
                         np.ones_like(ix, dtype=np.float64)], axis=-1)
    dirs_cam = dirs_cam.reshape(-1, 3)
    R, t = pose[:3, :3], pose[:3, 3]
    dirs_w = dirs_cam @ R.T
    origins = np.broadcast_to(t, dirs_w.shape)
    z = _ray_march(scene, origins, dirs_w, max_depth=max_depth)
    pts = origins + dirs_w * z[:, None]
    rgb = np.clip(scene.albedo(pts), 0.0, 1.0)
    rgb = np.where((z > 0)[:, None], rgb, 0.0)
    return (rgb.reshape(height, width, 3).astype(np.float32),
            z.reshape(height, width).astype(np.float32))


@dataclasses.dataclass
class AnalyticScene:
    """Reference-scale benchmark scene with *closed-form* ray intersections.

    A 10x3x10 m hollow room with interior pillars and spheres — sized so a
    full sweep grows the voxel map past the reference's operating point
    (~8-10k SURFACE voxels at 0.2 m, the scale of Replica room0 under
    `/root/reference/configs/replica/replica.yaml`). Rendering is exact
    ray/box/sphere intersection (no sphere-trace loop), so generating a
    multi-hundred-frame sequence on host costs seconds, not minutes.
    """

    room_half: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([6.0, 1.6, 6.0]))
    box_centers: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([
            [3.9, 0.0, 3.9], [-3.9, 0.0, 3.9],
            [3.9, 0.0, -3.9], [-3.9, 0.0, -3.9],
            [0.0, -1.2, 4.6], [4.6, -1.2, 0.0],
            [-4.6, -1.2, 0.0], [0.0, -1.2, -4.6],
        ]))
    box_halves: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([
            [0.35, 1.6, 0.35], [0.35, 1.6, 0.35],
            [0.35, 1.6, 0.35], [0.35, 1.6, 0.35],
            [1.0, 0.4, 0.55], [0.55, 0.4, 1.0],
            [0.55, 0.4, 1.0], [1.0, 0.4, 0.55],
        ]))
    sphere_centers: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([
            [1.9, -1.0, 1.9], [-2.0, -0.9, -1.8], [-2.3, 0.1, 2.3],
            [2.2, 0.3, -2.4], [0.0, -1.1, -3.1], [-3.1, -1.1, 0.0],
            [3.1, 0.0, 0.0],
        ]))
    sphere_radii: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array(
            [0.55, 0.65, 0.45, 0.5, 0.5, 0.55, 0.45]))

    def albedo(self, p: np.ndarray) -> np.ndarray:
        phases = np.array([[0.0, 2.1, 4.2]])
        freq = np.array([[1.1], [1.45], [1.8]])
        vals = np.stack([
            np.sin(freq[c, 0] * p[:, c % 3] + phases[0, c]) for c in range(3)
        ], axis=-1)
        return 0.5 + 0.45 * vals * np.cos(0.9 * p[:, ::-1])

    def trace(self, origins: np.ndarray, dirs: np.ndarray,
              max_depth: float = 10.0) -> np.ndarray:
        """Exact first-hit parameter t (in units of the given dirs, i.e.
        camera z-depth for pinhole dirs) for rays starting inside the room."""
        o, d = origins, dirs
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d
            # hollow room: depth to the walls = exit t of the room box
            lo = (-self.room_half[None] - o) * inv
            hi = (self.room_half[None] - o) * inv
            t = np.min(np.maximum(lo, hi), axis=-1)       # (N,) wall depth

            # solid pillars/boxes: entry t if in front of the camera
            blo = (self.box_centers[None] - self.box_halves[None]
                   - o[:, None]) * inv[:, None]            # (N, B, 3)
            bhi = (self.box_centers[None] + self.box_halves[None]
                   - o[:, None]) * inv[:, None]
            tn = np.max(np.minimum(blo, bhi), axis=-1)
            tf = np.min(np.maximum(blo, bhi), axis=-1)
            bhit = (tn <= tf) & (tn > 1e-4)
            t = np.minimum(t, np.min(np.where(bhit, tn, np.inf), axis=-1))

        # spheres (quadratic, unnormalized dirs)
        oc = o[:, None] - self.sphere_centers[None]        # (N, S, 3)
        A = np.sum(d * d, axis=-1)[:, None]
        B = 2.0 * np.sum(oc * d[:, None], axis=-1)
        C = np.sum(oc * oc, axis=-1) - self.sphere_radii[None] ** 2
        disc = B * B - 4.0 * A * C
        shit = disc > 0.0
        ts = np.where(shit, (-B - np.sqrt(np.abs(disc))) / (2.0 * A), np.inf)
        ts = np.where(ts > 1e-4, ts, np.inf)
        t = np.minimum(t, np.min(ts, axis=-1))
        return np.where(t < max_depth, t, 0.0)

    def render(self, pose: np.ndarray, width: int, height: int,
               fx: float, fy: float, cx: float, cy: float,
               max_depth: float = 10.0) -> Tuple[np.ndarray, np.ndarray]:
        """-> (rgb (H, W, 3) in [0,1], z-depth (H, W) meters, 0 invalid)."""
        ix, iy = np.meshgrid(np.arange(width), np.arange(height))
        dirs_cam = np.stack([(ix - cx) / fx, (iy - cy) / fy,
                             np.ones_like(ix, dtype=np.float64)], axis=-1)
        dirs_cam = dirs_cam.reshape(-1, 3)
        R, tr = pose[:3, :3], pose[:3, 3]
        dirs_w = dirs_cam @ R.T
        origins = np.broadcast_to(tr, dirs_w.shape)
        z = self.trace(origins, dirs_w, max_depth=max_depth)
        pts = origins + dirs_w * z[:, None]
        rgb = np.clip(self.albedo(pts), 0.0, 1.0)
        rgb = np.where((z > 0)[:, None], rgb, 0.0)
        return (rgb.reshape(height, width, 3).astype(np.float32),
                z.reshape(height, width).astype(np.float32))


def orbit_poses(num_frames: int, radius: float = 2.2,
                total_yaw: float = 2.0 * np.pi,
                height_wobble: float = 0.08) -> List[np.ndarray]:
    """Slow outward-looking orbit sweeping the whole scene, ending where it
    started (a loop-closure-style revisit of the first frames' view).

    At the defaults (full circle), per-frame motion is ``2*pi*radius/N``
    meters + ``360/N`` degrees of yaw — e.g. 1.4 cm + 0.36 deg at N=480 and
    r=1.1, the inter-frame scale of real RGB-D captures.
    """
    poses = []
    for i in range(num_frames):
        a = total_yaw * i / num_frames
        pos = np.array([radius * np.sin(a),
                        height_wobble * np.sin(5.0 * a),
                        radius * np.cos(a)])
        c, si = np.cos(a), np.sin(a)
        R = np.array([[c, 0, si], [0, 1, 0], [-si, 0, c]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        poses.append(T)
    return poses


class SyntheticDataset:
    """In-memory RGB-D sequence matching the reference loader protocol
    (`src/dataset/replica.py`): __len__, __getitem__ ->
    (index, rgb, depth, K, gt_pose), get_init_pose()."""

    def __init__(self, num_frames: int = 40, width: int = 80, height: int = 60,
                 seed: int = 0):
        self.scene = SyntheticScene()
        self.width, self.height = width, height
        self.fx = self.fy = 0.9 * width
        self.cx, self.cy = (width - 1) / 2.0, (height - 1) / 2.0
        self.poses = look_poses(num_frames)
        self.frames = [
            render_frame(self.scene, p, width, height,
                         self.fx, self.fy, self.cx, self.cy)
            for p in self.poses
        ]

    @property
    def intrinsics(self):
        return (self.fx, self.fy, self.cx, self.cy)

    def get_init_pose(self) -> np.ndarray:
        return self.poses[0]

    def __len__(self):
        return len(self.poses)

    def __getitem__(self, i):
        rgb, depth = self.frames[i]
        K = np.array([[self.fx, 0, self.cx], [0, self.fy, self.cy],
                      [0, 0, 1.0]])
        return i, rgb, depth, K, self.poses[i]


class BenchDataset:
    """Reference-scale benchmark sequence over an :class:`AnalyticScene`.

    Frames are stored *quantized* (uint8 rgb, uint16 depth at the dataset's
    ``max_depth`` scale — the native encoding of real RGB-D captures and of
    ``SlamSystem.upload_frame``), so a 480-frame 320x240 sequence costs
    ~450 MB of host RAM instead of ~1.9 GB of float32.
    """

    def __init__(self, num_frames: int = 480, width: int = 320,
                 height: int = 240, radius: float = 1.1,
                 max_depth: float = 10.0, depth_noise: float = 0.0,
                 seed: int = 0):
        self.scene = AnalyticScene()
        self.width, self.height = width, height
        self.max_depth = max_depth
        self.fx = self.fy = 0.9 * width
        self.cx, self.cy = (width - 1) / 2.0, (height - 1) / 2.0
        self.poses = orbit_poses(num_frames, radius=radius)
        self.depth_quant = 65535.0 / max_depth
        rng = np.random.default_rng(seed)
        self.frames = []
        for p in self.poses:
            rgb, depth = self.scene.render(
                p, width, height, self.fx, self.fy, self.cx, self.cy,
                max_depth=max_depth)
            if depth_noise > 0.0:
                noise = rng.normal(0.0, depth_noise, depth.shape)
                depth = np.where(depth > 0.0, np.maximum(
                    depth + noise.astype(np.float32) * depth, 0.01), 0.0)
            self.frames.append(self.quantize(rgb, depth))

    def quantize(self, rgb: np.ndarray, depth: np.ndarray):
        return (np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8),
                np.clip(depth * self.depth_quant + 0.5, 0,
                        65535.0).astype(np.uint16))

    @property
    def intrinsics(self):
        return (self.fx, self.fy, self.cx, self.cy)

    def get_init_pose(self) -> np.ndarray:
        return self.poses[0]

    def __len__(self):
        return len(self.poses)

    def __getitem__(self, i):
        rgb, depth = self.frames[i]
        K = np.array([[self.fx, 0, self.cx], [0, self.fy, self.cy],
                      [0, 0, 1.0]])
        return i, rgb, depth, K, self.poses[i]

    def dequantized(self, i):
        """Float32 (rgb, depth) of frame i (for initialization paths)."""
        rgb, depth = self.frames[i]
        return (rgb.astype(np.float32) / 255.0,
                depth.astype(np.float32) / self.depth_quant)
