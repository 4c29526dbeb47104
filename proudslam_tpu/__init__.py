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

from proudslam_tpu.config import Config, load_config  # noqa: F401
