"""Run artifact logger (reference `src/loggers.py:14-138`).

Creates ``<log_dir>/<exp_name>/<timestamp>/{imgs,mesh,ckpt,bak,misc}``,
backs up the config, and saves meshes / numpy dumps / rendered-vs-gt image
panels (matplotlib; open3d is unavailable here, meshes go to PLY via
`proudslam_tpu.mesher.save_ply`). Also logs scalar metrics to a JSONL
stream — the observability the reference only had as commented-out
tensorboard calls (`render_helpers.py:578-607`).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import time
from typing import Dict, Optional

import numpy as np


class RunLogger:
    def __init__(self, log_dir: str, exp_name: str = "default",
                 for_eval: bool = False):
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        self.dir = osp.join(log_dir, exp_name, stamp)
        self.img_dir = osp.join(self.dir, "imgs")
        self.mesh_dir = osp.join(self.dir, "mesh")
        self.ckpt_dir = osp.join(self.dir, "ckpt")
        self.backup_dir = osp.join(self.dir, "bak")
        self.misc_dir = osp.join(self.dir, "misc")
        for d in (self.img_dir, self.mesh_dir, self.ckpt_dir,
                  self.backup_dir, self.misc_dir):
            os.makedirs(d, exist_ok=True)
        self._metrics = open(osp.join(self.dir, "metrics.jsonl"), "a")

    def log_config(self, config_path: Optional[str] = None,
                   config_dict: Optional[dict] = None):
        if config_path and osp.exists(config_path):
            shutil.copy(config_path, self.backup_dir)
        if config_dict is not None:
            with open(osp.join(self.backup_dir, "config.json"), "w") as f:
                json.dump(config_dict, f, indent=2, default=str)

    def log_metrics(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._metrics.write(json.dumps(rec) + "\n")
        self._metrics.flush()

    def log_numpy(self, data: np.ndarray, name: str):
        np.save(osp.join(self.misc_dir, f"{name}.npy"), np.asarray(data))

    def log_mesh(self, mesh, name: str = "final_mesh.ply"):
        from proudslam_tpu.mesher import save_ply
        save_ply(osp.join(self.mesh_dir, name), mesh)

    def log_images(self, index: int, gt_rgb, gt_depth, rgb, depth):
        """2x3 rendered-vs-gt panel (reference `loggers.py:84-138`)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        gt_depth = np.asarray(gt_depth)
        depth = np.asarray(depth).reshape(gt_depth.shape)
        rgb = np.asarray(rgb).reshape(np.asarray(gt_rgb).shape)
        gt_rgb = np.asarray(gt_rgb)
        max_depth = max(gt_depth.max(), depth.max(), 1e-6)
        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        axs[0, 0].imshow(gt_depth, vmin=0, vmax=max_depth, cmap="jet")
        axs[0, 0].set_title("input depth")
        axs[0, 1].imshow(depth, vmin=0, vmax=max_depth, cmap="jet")
        axs[0, 1].set_title("rendered depth")
        axs[0, 2].imshow(np.abs(depth - gt_depth), vmin=0,
                         vmax=max_depth / 4, cmap="jet")
        axs[0, 2].set_title("depth error")
        axs[1, 0].imshow(np.clip(gt_rgb, 0, 1))
        axs[1, 0].set_title("input rgb")
        axs[1, 1].imshow(np.clip(rgb, 0, 1))
        axs[1, 1].set_title("rendered rgb")
        axs[1, 2].imshow(np.abs(rgb - gt_rgb).mean(-1), vmin=0, vmax=0.5,
                         cmap="jet")
        axs[1, 2].set_title("rgb error")
        for ax in axs.ravel():
            ax.axis("off")
        plt.tight_layout()
        fig.savefig(osp.join(self.img_dir, f"render_{index:05d}.jpg"),
                    dpi=100)
        plt.close(fig)
