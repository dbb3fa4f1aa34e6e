"""End-to-end visual odometry on a synthetic sequence: initialize,
track, insert keyframes, run local BA — then check ATE vs ground truth."""

import numpy as np
import pytest

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.evaluate import ate_rmse, umeyama_alignment
from send_slam_tpu.io.protocol import TRACKING_OK
from send_slam_tpu.models.system import System

from send_slam_tpu.utils.synth import SyntheticWorld


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld()


@pytest.fixture(scope="module")
def engine_cfg(world):
    return EngineConfig(
        orb=OrbConfig(n_features=512, n_levels=4),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy),
        map=MapConfig(max_keyframes=32, max_landmarks=2048, ba_window=4),
        tracking=TrackingConfig(init_min_matches=50, pipeline_stretch=1),
    )


class TestUmeyama:
    def test_recovers_known_sim3(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(50, 3))
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
        s, t = 2.5, np.array([1.0, -2.0, 0.5])
        dst = s * src @ R.T + t
        s2, R2, t2 = umeyama_alignment(src, dst)
        assert abs(s2 - s) < 1e-6
        np.testing.assert_allclose(R2, R, atol=1e-8)
        np.testing.assert_allclose(t2, t, atol=1e-8)


class TestEndToEnd:
    def test_vo_on_synthetic_sequence(self, world, engine_cfg):
        ts, Rs, tls = world.trajectory(n_frames=40)
        sys = System(engine_cfg)

        est_ts, est_pos = [], []
        ok_frames = 0
        for k in range(len(ts)):
            img = world.render(Rs[k], tls[k])
            out = sys.track_monocular(img, float(ts[k]))
            if out.tracking_state == TRACKING_OK:
                ok_frames += 1
                est_ts.append(out.timestamp)
                est_pos.append(out.position)

        # Must initialize within the sequence and keep tracking.
        assert ok_frames >= 22, ok_frames
        assert int(sys.map.n_kf) >= 2
        assert int(sys.map.n_landmarks()) > 100

        # Ground-truth camera centers.
        gt_pos = [-R.T @ t for R, t in zip(Rs, tls)]
        err = ate_rmse(est_ts, np.asarray(est_pos), ts, np.asarray(gt_pos))
        # Round-1 bar: ATE < 12% of the ~1.7 m trajectory on this sparse
        # synthetic scene (scale drift dominates; tightens once loop
        # closure / global BA land).
        assert err < 0.2, err

    def test_trajectory_export_format(self, world, engine_cfg):
        sys = System(engine_cfg)
        ts, Rs, tls = world.trajectory(n_frames=12)
        for k in range(len(ts)):
            sys.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
        tum = sys.keyframe_trajectory_tum()
        lines = [l for l in tum.strip().splitlines() if l]
        if lines:
            parts = lines[0].split()
            assert len(parts) == 8
            float(parts[0])
