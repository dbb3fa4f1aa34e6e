"""Map checkpoint/resume and dataset loaders."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from send_slam_tpu.config import CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig
from send_slam_tpu.io.map_io import load_map, save_map
from send_slam_tpu.io.dataset import TumSequence, open_sequence
from send_slam_tpu.models.map_state import empty_map, insert_keyframe
from send_slam_tpu.models.system import System
from send_slam_tpu.utils.synth import SyntheticWorld


class TestMapIO:
    def test_roundtrip(self, tmp_path):
        from send_slam_tpu.config import MapConfig
        m = empty_map(MapConfig(max_keyframes=4, max_landmarks=16), 8)
        rng = np.random.default_rng(0)
        m, _ = insert_keyframe(
            m, jnp.eye(3), jnp.ones(3), 1.5,
            jnp.asarray(rng.uniform(0, 100, (8, 2)), jnp.float32),
            jnp.asarray(rng.integers(0, 2**32, (8, 8), dtype=np.uint32)),
            jnp.zeros(8, jnp.int32), jnp.ones(8, bool),
            jnp.full((8,), -1, jnp.int32))
        path = str(tmp_path / "map.npz")
        save_map(m, path)
        m2 = load_map(path)
        for f in m._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(m, f)), np.asarray(getattr(m2, f)), f)

    def test_session_resume_relocalizes(self, tmp_path):
        """Session 1 builds a map; session 2 loads it and relocalizes."""
        world = SyntheticWorld(n_points=600)
        cfg = EngineConfig(
            orb=OrbConfig(n_features=512, n_levels=4),
            camera=CameraConfig(width=world.W, height=world.H,
                                fx=world.fx, fy=world.fy,
                                cx=world.cx, cy=world.cy),
            map=MapConfig(max_keyframes=32, max_landmarks=2048, ba_window=4),
            tracking=TrackingConfig(init_min_matches=50),
        )
        ts, Rs, tls = world.trajectory(n_frames=24)
        s1 = System(cfg)
        for k in range(len(ts)):
            s1.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
        assert int(s1.map.n_kf) >= 2
        path = str(tmp_path / "map.npz")
        s1.save_map(path)

        s2 = System(cfg)
        s2.load_map(path)
        # Feed frames from the mapped region: must relocalize (within
        # a few attempts), not re-initialize.
        states = []
        for k in (10, 11, 12):
            out = s2.track_monocular(world.render(Rs[k], tls[k]), 99.0 + k)
            states.append(out.tracking_state)
        assert 2 in states, states
        assert int(s2.map.n_kf) == int(s1.map.n_kf)  # same map, no re-init


class TestDatasets:
    def _fake_tum(self, root):
        import cv2
        os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
        lines = ["# comment"]
        rng = np.random.default_rng(0)
        for i in range(3):
            name = f"rgb/{i}.png"
            cv2.imwrite(os.path.join(root, name),
                        rng.integers(0, 255, (24, 32), dtype=np.uint8))
            lines.append(f"{i / 30.0:.6f} {name}")
        with open(os.path.join(root, "rgb.txt"), "w") as f:
            f.write("\n".join(lines))
        with open(os.path.join(root, "groundtruth.txt"), "w") as f:
            f.write("# ts tx ty tz qx qy qz qw\n")
            for i in range(3):
                f.write(f"{i / 30.0:.6f} {i * 0.1} 0 0 0 0 0 1\n")

    def test_tum_loader(self, tmp_path):
        root = str(tmp_path / "seq")
        self._fake_tum(root)
        seq = open_sequence(root)
        assert isinstance(seq, TumSequence)
        assert len(seq) == 3
        frames = list(seq)
        assert frames[0][1].shape == (24, 32)
        ts, pos = seq.gt_positions()
        assert len(ts) == 3
        np.testing.assert_allclose(pos[2, 0], 0.2)
