"""proudslam_tpu — a TPU-native neural implicit SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the Vox-Fusion-style dense RGB-D
SLAM pipeline (reference: DARYL-GWZ/Proud-SLAM):

  * frame-to-model tracking: SE(3) pose optimization against a differentiable
    SDF volume renderer,
  * incremental mapping: sparse voxel feature grid + joint
    embedding/decoder/keyframe-pose bundle adjustment,
  * marching-cubes mesh extraction.

Design stance (see SURVEY.md §7): one SPMD program with deterministic
track/map interleaving, static-shape capacity-bounded map state, a flat
voxel hash instead of a pointer octree, and fused Pallas kernels for the
render hot loop. Scale-out is expressed with jax.sharding over a device
mesh (data-parallel rays, replicated map, psum gradient reduction).
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXU f32 matmuls default to bf16 inputs (one MXU pass). Geometry runs
# through matmuls everywhere here — `points @ R.T` for map insertion,
# `dirs @ R.T` for ray rotation, pose composition — and bf16 rounding
# quantizes positions to ~0.4% relative (2 cm at 5 m; a tracked pose at
# z=1.4 m snaps to 0.78 cm steps), which destroys cm-class SLAM accuracy.
# Force true-f32 matmuls globally; the compute-heavy decoder MLP runs in
# the Pallas kernel (ops/pallas/mlp_kernel.py), which is unaffected, and
# the few XLA-path matmuls that tolerate lower precision can opt back in
# with an explicit precision= argument.
_jax.config.update("jax_default_matmul_precision", "highest")

from proudslam_tpu.config import Config, load_config  # noqa: F401
