"""Dataset loaders + ground-truth association for offline evaluation.

Covers the evaluation configs in BASELINE.json: TUM RGB-D monocular
sequences (fr1_xyz etc. — rgb.txt index + groundtruth.txt) and
EuRoC MAV (mav0/cam0/data + state estimate csv). Only grayscale frames
and timestamps are consumed (monocular). Datasets are optional on this
machine; loaders raise FileNotFoundError cleanly when absent and the
bench falls back to the synthetic world.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


class TumSequence:
    """TUM RGB-D layout: rgb.txt lists "timestamp rgb/<file>.png";
    groundtruth.txt lists "timestamp tx ty tz qx qy qz qw"."""

    # fr1 intrinsics (the standard calibrated values).
    FR1_INTRINSICS = dict(fx=517.306408, fy=516.469215,
                          cx=318.643040, cy=255.313989,
                          k1=0.262383, k2=-0.953104, p1=-0.005358,
                          p2=0.002628, k3=1.163314)

    def __init__(self, root: str):
        self.root = root
        rgb_txt = os.path.join(root, "rgb.txt")
        if not os.path.exists(rgb_txt):
            raise FileNotFoundError(rgb_txt)
        self.frames: List[Tuple[float, str]] = []
        with open(rgb_txt) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                self.frames.append((float(ts), os.path.join(root, rel)))
        self.groundtruth = self._load_gt(os.path.join(root, "groundtruth.txt"))

    @staticmethod
    def _load_gt(path: str) -> Optional[np.ndarray]:
        if not os.path.exists(path):
            return None
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rows.append([float(v) for v in line.split()[:8]])
        return np.asarray(rows)  # (N, 8): ts tx ty tz qx qy qz qw

    def __len__(self) -> int:
        return len(self.frames)

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        import cv2
        for ts, path in self.frames:
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if img is not None:
                yield ts, img

    def gt_positions(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.groundtruth is None:
            raise ValueError("no groundtruth.txt")
        return self.groundtruth[:, 0], self.groundtruth[:, 1:4]


class EurocSequence:
    """EuRoC MAV layout: mav0/cam0/data/<ns>.png with data.csv index;
    ground truth in mav0/state_groundtruth_estimate0/data.csv."""

    CAM0_INTRINSICS = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                           k1=-0.28340811, k2=0.07395907,
                           p1=0.00019359, p2=1.76187114e-05, k3=0.0)

    def __init__(self, root: str):
        self.root = root
        cam_csv = os.path.join(root, "mav0", "cam0", "data.csv")
        if not os.path.exists(cam_csv):
            raise FileNotFoundError(cam_csv)
        self.frames = []
        with open(cam_csv) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ns, fname = line.split(",")[:2]
                self.frames.append((
                    int(ns) * 1e-9,
                    os.path.join(root, "mav0", "cam0", "data", fname.strip())))
        gt_csv = os.path.join(root, "mav0",
                              "state_groundtruth_estimate0", "data.csv")
        self.groundtruth = None
        if os.path.exists(gt_csv):
            rows = []
            with open(gt_csv) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    vals = line.split(",")
                    rows.append([int(vals[0]) * 1e-9] +
                                [float(v) for v in vals[1:4]])
            self.groundtruth = np.asarray(rows)

    def __len__(self) -> int:
        return len(self.frames)

    def __iter__(self):
        import cv2
        for ts, path in self.frames:
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if img is not None:
                yield ts, img

    def gt_positions(self):
        if self.groundtruth is None:
            raise ValueError("no ground truth")
        return self.groundtruth[:, 0], self.groundtruth[:, 1:4]


def open_sequence(root: str):
    """Auto-detect dataset flavour."""
    if os.path.exists(os.path.join(root, "rgb.txt")):
        return TumSequence(root)
    if os.path.exists(os.path.join(root, "mav0")):
        return EurocSequence(root)
    raise FileNotFoundError(f"no known dataset layout at {root}")
