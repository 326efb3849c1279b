from bundlefusion_tpu.geometry.lie import (  # noqa: F401
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    pose_to_matrix,
    matrix_to_pose,
    pose_compose,
    pose_inverse,
    transform_points,
)
from bundlefusion_tpu.geometry.kabsch import kabsch  # noqa: F401
from bundlefusion_tpu.geometry.camera import CameraIntrinsics  # noqa: F401
