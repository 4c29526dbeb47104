#!/usr/bin/env python
"""Offline run viewer (parity for the reference's `demo/view.py` replay,
adapted to headless rendering: open3d is unavailable, so artifacts are
rendered to images with matplotlib).

    python scripts/view_run.py logs/<exp>/<timestamp>

Produces into ``<run>/view/``:
  * trajectory.png — top-down + side trajectory vs keyframes
  * mesh.png       — shaded triangle mesh snapshot
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

# allow running from a source checkout without installing the package
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def plot_trajectory(run_dir, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traj_path = osp.join(run_dir, "misc", "frame_poses.npy")
    if not osp.exists(traj_path):
        print("no frame_poses.npy")
        return
    traj = np.load(traj_path)
    t = traj[:, :3, 3]
    fig, axs = plt.subplots(1, 2, figsize=(12, 5))
    axs[0].plot(t[:, 0], t[:, 2], "-", lw=1)
    axs[0].scatter(t[0, 0], t[0, 2], c="g", label="start")
    axs[0].scatter(t[-1, 0], t[-1, 2], c="r", label="end")
    axs[0].set_xlabel("x [m]")
    axs[0].set_ylabel("z [m]")
    axs[0].set_title("top-down trajectory")
    axs[0].axis("equal")
    axs[0].legend()
    axs[1].plot(t[:, 1], lw=1)
    axs[1].set_xlabel("frame")
    axs[1].set_ylabel("y [m]")
    axs[1].set_title("height profile")
    fig.tight_layout()
    fig.savefig(osp.join(out_dir, "trajectory.png"), dpi=120)
    plt.close(fig)
    print("wrote trajectory.png")


def load_ply(path):
    verts, faces = [], []
    with open(path) as f:
        n_v = n_f = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line == "end_header":
                break
        for _ in range(n_v):
            verts.append([float(x) for x in f.readline().split()[:3]])
        for _ in range(n_f):
            faces.append([int(x) for x in f.readline().split()[1:4]])
    return np.asarray(verts), np.asarray(faces)


def plot_mesh(run_dir, out_dir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    meshes = sorted(
        f for f in os.listdir(osp.join(run_dir, "mesh"))
        if f.endswith(".ply")) if osp.isdir(osp.join(run_dir, "mesh")) else []
    if not meshes:
        print("no meshes")
        return
    verts, faces = load_ply(osp.join(run_dir, "mesh", meshes[-1]))
    if len(faces) == 0:
        return
    # subsample faces for speed
    if len(faces) > 40000:
        faces = faces[np.random.default_rng(0).choice(
            len(faces), 40000, replace=False)]
    tris = verts[faces]
    normals = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    normals /= (np.linalg.norm(normals, axis=-1, keepdims=True) + 1e-9)
    shade = 0.4 + 0.6 * np.clip(normals @ np.array([0.4, -0.8, 0.45]), 0, 1)
    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    pc = Poly3DCollection(tris, facecolors=plt.cm.bone(shade),
                          edgecolor="none")
    ax.add_collection3d(pc)
    lo, hi = verts.min(0), verts.max(0)
    mid, half = (lo + hi) / 2, (hi - lo).max() / 2
    ax.set_xlim(mid[0] - half, mid[0] + half)
    ax.set_ylim(mid[1] - half, mid[1] + half)
    ax.set_zlim(mid[2] - half, mid[2] + half)
    ax.view_init(elev=-60, azim=-90)
    fig.savefig(osp.join(out_dir, "mesh.png"), dpi=120)
    plt.close(fig)
    print(f"wrote mesh.png ({meshes[-1]}: {len(verts)} verts)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_dir")
    args = parser.parse_args()
    out_dir = osp.join(args.run_dir, "view")
    os.makedirs(out_dir, exist_ok=True)
    plot_trajectory(args.run_dir, out_dir)
    plot_mesh(args.run_dir, out_dir)


if __name__ == "__main__":
    sys.exit(main())
