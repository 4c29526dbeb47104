from proudslam_tpu.geometry.se3 import (  # noqa: F401
    exp_rotation, log_rotation, matrix_from_tangent, tangent_from_matrix,
    skew, taylor_A, taylor_B,
)
from proudslam_tpu.geometry.camera import (  # noqa: F401
    pixel_ray_directions, backproject, transform_points,
)
