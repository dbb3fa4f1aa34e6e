"""Pure-JAX geometry core: SO3/SE3/Sim3, cameras, triangulation.

Replaces the reference backend's Eigen/Sophus usage
(orbslam3_mono_networked.cc:44-46 `Sophus::SE3f`) and ORB-SLAM3's
GeometricTools/Converter (slam_backends/orb_slam_3/CMakeLists.txt:55,72)
with jit-friendly, vmap-able functions on plain arrays. Poses are
(R, t) pairs or 4x4 matrices; rotations also as unit quaternions
(x, y, z, w) to match the reference pose packet layout
(orbslam3_mono_networked.cc:236-264).
"""

from send_slam_tpu.geometry.se3 import (  # noqa: F401
    hat, vee, so3_exp, so3_log,
    se3_exp, se3_log, se3_inverse, se3_compose, se3_apply,
    se3_identity, quat_from_rotmat, rotmat_from_quat, quat_normalize,
)
from send_slam_tpu.geometry.sim3 import (  # noqa: F401
    sim3_exp, sim3_log, sim3_inverse, sim3_compose, sim3_apply,
)
from send_slam_tpu.geometry.camera import (  # noqa: F401
    project, unproject, distort_radtan, undistort_points, intrinsics_matrix,
)
from send_slam_tpu.geometry.triangulate import (  # noqa: F401
    triangulate_dlt, triangulate_batch,
)
from send_slam_tpu.geometry.epipolar import (  # noqa: F401
    eight_point_fundamental, homography_dlt, sampson_error, homography_error,
)
