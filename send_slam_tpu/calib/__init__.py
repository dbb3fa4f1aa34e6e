"""Camera calibration subsystem: checkerboard detection + Zhang
intrinsics, replacing SendSlam.CameraCalibrator
(send_slam/lib/send_slam/camera_calibrator.ex) and its Evision calib3d
calls with on-device corner detection/refinement and a JAX Zhang +
Levenberg-Marquardt pipeline. The persisted JSON is byte-compatible
with the reference's priv/calibration/latest.json format
(camera_calibrator.ex:321-399)."""

from send_slam_tpu.calib.io import (  # noqa: F401
    calibration_to_json, calibration_from_json, default_output_path,
    load_from_file, save_to_file,
)
from send_slam_tpu.calib.checkerboard import (  # noqa: F401
    detect_checkerboard, corner_response_map,
)
from send_slam_tpu.calib.zhang import calibrate_camera  # noqa: F401
