"""PnP RANSAC relocalization on synthetic scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.config import TrackingConfig
from send_slam_tpu.geometry.se3 import se3_exp
from send_slam_tpu.models.relocalize import _pnp_dlt, relocalize

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
RNG = np.random.default_rng(5)


def scene(n=200):
    return RNG.uniform([-3, -2, 4], [3, 2, 10], (n, 3)).astype(np.float32)


class TestPnPDlt:
    def test_exact_recovery(self):
        X = scene(12)
        R_gt, t_gt = se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.1, -0.2, 0.05]))
        p = X @ np.asarray(R_gt).T + np.asarray(t_gt)
        xn = (p[:, :2] / p[:, 2:3]).astype(np.float32)
        R, t = _pnp_dlt(jnp.asarray(X[:6]), jnp.asarray(xn[:6]))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-2)


class TestRelocalize:
    def test_recovers_pose_with_distractors(self):
        n_lm, n_extra = 250, 150
        X = scene(n_lm)
        R_gt, t_gt = se3_exp(jnp.asarray([0.4, 0.2, -0.1, 0.1, -0.15, 0.08]))
        p = X @ np.asarray(R_gt).T + np.asarray(t_gt)
        uv = np.stack([FX * p[:, 0] / p[:, 2] + CX,
                       FY * p[:, 1] / p[:, 2] + CY], -1)
        uv += RNG.normal(0, 0.3, uv.shape)

        lm_desc = RNG.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)
        kp_desc = np.concatenate(
            [lm_desc, RNG.integers(0, 2**32, (n_extra, 8), dtype=np.uint32)])
        kp_uv = np.concatenate(
            [uv, RNG.uniform([0, 0], [640, 480], (n_extra, 2))]
        ).astype(np.float32)
        K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], jnp.float32)

        res = relocalize(
            jnp.asarray(X), jnp.asarray(lm_desc), jnp.ones(n_lm, bool),
            jnp.asarray(kp_uv), jnp.asarray(kp_desc),
            jnp.ones(n_lm + n_extra, bool),
            K, jax.random.PRNGKey(0), TrackingConfig())
        assert bool(res.ok)
        assert int(res.n_inliers) > 150
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=3e-2)

    def test_fails_without_structure(self):
        n = 100
        X = scene(n)
        lm_desc = RNG.integers(0, 2**32, (n, 8), dtype=np.uint32)
        kp_desc = RNG.integers(0, 2**32, (n, 8), dtype=np.uint32)  # unrelated
        kp_uv = RNG.uniform([0, 0], [640, 480], (n, 2)).astype(np.float32)
        K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], jnp.float32)
        res = relocalize(
            jnp.asarray(X), jnp.asarray(lm_desc), jnp.ones(n, bool),
            jnp.asarray(kp_uv), jnp.asarray(kp_desc), jnp.ones(n, bool),
            K, jax.random.PRNGKey(1), TrackingConfig())
        assert not bool(res.ok)


class TestKidnappedRobot:
    @staticmethod
    def _sweep(world, x0, x1, n, fps=30.0, t0=0.0):
        ts, Rs, tls = [], [], []
        for k in range(n):
            x = x0 + (x1 - x0) * k / max(n - 1, 1)
            R = np.eye(3)
            c = np.array([x, 0.0, 0.0])
            ts.append(t0 + k / fps)
            Rs.append(R)
            tls.append(-R @ c)
        return ts, Rs, tls

    def test_load_map_and_recover_from_far_pose(self, tmp_path):
        """Multi-session resume (BASELINE config 5) + kidnapped robot:
        build a map over x in [0, 1.2], save it, start a FRESH System,
        load the map, and feed frames from x ~= 1.0 — an arbitrary
        mapped viewpoint far from the origin. The multi-candidate
        reloc (top-k retrieval priors + prior-free PnP RANSAC) must
        recover and resume tracking (VERDICT r2 item 6)."""
        from send_slam_tpu.config import (
            CameraConfig, EngineConfig, MapConfig, OrbConfig,
            TrackingConfig,
        )
        from send_slam_tpu.models.system import System
        from send_slam_tpu.utils.synth import SyntheticWorld

        world = SyntheticWorld(n_points=900)
        cfg = EngineConfig(
            orb=OrbConfig(n_features=512, n_levels=4),
            camera=CameraConfig(width=world.W, height=world.H,
                                fx=world.fx, fy=world.fy,
                                cx=world.cx, cy=world.cy),
            map=MapConfig(max_keyframes=32, max_landmarks=2048,
                          ba_window=4),
            tracking=TrackingConfig(init_min_matches=50,
                                    pipeline_stretch=1),
        )
        ts, Rs, tls = self._sweep(world, 0.0, 1.2, 60)
        s1 = System(cfg)
        for k in range(60):
            s1.track_monocular(world.render(Rs[k], tls[k]), float(ts[k]))
        s1._flush_pipeline()
        assert s1._n_kf_host >= 5
        path = str(tmp_path / "map.npz")
        s1.save_map(path)

        s2 = System(cfg)
        s2.load_map(path)
        from send_slam_tpu.io.protocol import TRACKING_OK
        ts2, Rs2, tls2 = self._sweep(world, 1.0, 0.9, 12, t0=10.0)
        states = []
        for k in range(12):
            out = s2.track_monocular(world.render(Rs2[k], tls2[k]),
                                     float(ts2[k]))
            states.append(out.tracking_state)
        assert TRACKING_OK in states, states
        # Once recovered, it STAYS recovered.
        first_ok = states.index(TRACKING_OK)
        assert all(st == TRACKING_OK for st in states[first_ok:]), states
