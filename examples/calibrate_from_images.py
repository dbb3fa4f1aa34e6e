"""Calibrate a camera from checkerboard images — the stand-alone
counterpart of the reference's examples/simple_calibrate_example.exs.

Usage:
    python examples/calibrate_from_images.py 'shots/*.png' \
        --pattern 9x6 --square-mm 25 [--out priv/calibration/latest.json]

Prints the recovered intrinsics and persists them in the reference's
JSON format, loadable by both this engine and the reference app.
"""

import argparse
import glob
import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pattern_glob", help="glob of checkerboard images")
    p.add_argument("--pattern", default="9x6",
                   help="inner corners, COLSxROWS (default 9x6)")
    p.add_argument("--square-mm", type=float, default=25.0)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import cv2

    from send_slam_tpu.calib.io import save_to_file
    from send_slam_tpu.calib.pipeline import calibrate

    cols, rows = (int(v) for v in args.pattern.split("x"))
    paths = sorted(glob.glob(args.pattern_glob))
    if not paths:
        sys.exit(f"no images match {args.pattern_glob}")
    frames = []
    for path in paths:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is not None:
            frames.append(img.astype(np.float32))
    print(f"loaded {len(frames)} frames")

    result = calibrate(frames, (cols, rows), args.square_mm)
    K = result["camera_matrix"]
    d = result["distortion_coeffs"].reshape(-1)
    print(f"fx={K[0,0]:.2f} fy={K[1,1]:.2f} cx={K[0,2]:.2f} cy={K[1,2]:.2f}")
    print(f"dist: k1={d[0]:.4f} k2={d[1]:.4f} p1={d[2]:.5f} "
          f"p2={d[3]:.5f} k3={d[4]:.4f}")
    print(f"rms reprojection: {result['reprojection_error']:.3f} px "
          f"over {result['successful_frames']} frames")
    path = save_to_file(result, args.out)
    print(f"saved -> {path}")


if __name__ == "__main__":
    main()
