"""Atlas multi-map: freeze on prolonged loss, weld on re-detection.

Unit level: weld_maps under a known Sim(3) must land frozen keyframes/
landmarks in the active world exactly. Session level: a sequence with a
hard occlusion over a scene jump must start map #2 and weld it back to
map #1 when the camera re-approaches mapped territory (ORB-SLAM3 Atlas
+ LoopClosing::MergeLocal, CMakeLists.txt:58,51)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.models.atlas import (
    best_cross_map_candidate, cross_map_sim3, weld_maps,
)
from send_slam_tpu.models.map_state import (
    add_landmarks, empty_map, insert_keyframe,
)

N_KP = 32


def _map_with(n_kf, lm_pos, seed=0):
    """A small map with n_kf keyframes and the given landmarks, each
    observed by keyframes 0 and 1."""
    rng = np.random.default_rng(seed)
    cfg = MapConfig(max_keyframes=16, max_landmarks=128, ba_window=4)
    m = empty_map(cfg, N_KP)
    for k in range(n_kf):
        desc = rng.integers(0, 2 ** 32, (N_KP, 8), dtype=np.uint32)
        m, _ = insert_keyframe(
            m, jnp.eye(3), jnp.asarray([0.1 * k, 0, 0], jnp.float32),
            float(k),
            jnp.asarray(rng.uniform(0, 100, (N_KP, 2)), jnp.float32),
            jnp.asarray(desc), jnp.zeros((N_KP,), jnp.int32),
            jnp.ones((N_KP,), bool), jnp.full((N_KP,), -1, jnp.int32))
    P = lm_pos.shape[0]
    desc = jnp.asarray(
        rng.integers(0, 2 ** 32, (P, 8), dtype=np.uint32))
    m, ids = add_landmarks(
        m, jnp.asarray(lm_pos, jnp.float32), desc,
        jnp.ones((P,), bool), jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32), jnp.arange(P, dtype=jnp.int32),
        jnp.asarray(1, jnp.int32), jnp.arange(P, dtype=jnp.int32))
    return m


class TestWeld:
    def test_weld_transforms_and_imports(self):
        rng = np.random.default_rng(3)
        lmA = rng.uniform(-2, 2, (20, 3))
        lmB = rng.uniform(-2, 2, (15, 3))
        active = _map_with(3, lmA, seed=1)
        frozen = _map_with(4, lmB, seed=2)

        s = 1.7
        R = Rotation.from_rotvec([0.1, 0.3, -0.2]).as_matrix()
        t = np.array([2.0, -1.0, 0.5])
        m, n_kf_imp, n_lm_imp = weld_maps(
            active, frozen, jnp.asarray(s, jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))

        assert int(n_kf_imp) == 4
        assert int(n_lm_imp) == 15
        assert int(m.n_kf) == 7
        # Imported keyframes occupy slots 3..6, chain break on slot 3.
        assert bool(m.kf_chain_break[3])
        assert not bool(m.kf_chain_break[4])
        # Imported landmark positions transformed by the Sim3.
        lm_valid = np.asarray(m.lm_valid)
        pos = np.asarray(m.lm_pos)[lm_valid]
        expect = s * lmB @ R.T + t
        # The imported rows are those not already in the active map.
        d = np.abs(pos[:, None, :] - expect[None, :, :]).sum(-1).min(0)
        assert d.max() < 1e-4
        # Imported keyframe poses: projecting a transformed landmark
        # must give the same camera-frame point (up to scale s).
        Xf = lmB[0]
        Xa = s * R @ Xf + t
        Rf = np.asarray(frozen.kf_R[1])
        tf = np.asarray(frozen.kf_t[1])
        p_f = Rf @ Xf + tf
        Ra = np.asarray(m.kf_R[4])      # frozen KF1 -> slot 4
        ta = np.asarray(m.kf_t[4])
        p_a = Ra @ Xa + ta
        np.testing.assert_allclose(p_a, s * p_f, atol=1e-4)

    def test_cross_map_retrieval_and_sim3(self):
        rng = np.random.default_rng(3)
        lm = rng.uniform(-2, 2, (24, 3))
        frozen = _map_with(3, lm, seed=7)
        # Active map shares KF0's descriptors (same place revisited):
        # clone frozen and transform landmark positions by a Sim3.
        s, R, t = 1.3, Rotation.from_rotvec([0, 0.2, 0]).as_matrix(), \
            np.array([1.0, 0.0, -0.5])
        active = frozen._replace(
            lm_pos=jnp.asarray(s * np.asarray(frozen.lm_pos) @ R.T + t,
                               jnp.float32))
        # Query with a keyframe that actually carries observations
        # (landmarks register on keyframes 0 and 1 in _map_with).
        kf, score = best_cross_map_candidate(
            frozen, active.kf_signature[1])
        assert float(score) > 0.9          # same signature
        assert int(kf) == 1
        res = cross_map_sim3(
            active, frozen, jnp.asarray(1), kf,
            jax.random.PRNGKey(0), TrackingConfig())
        assert bool(res.ok)
        assert abs(float(res.sim3.s) - s) < 1e-2
        np.testing.assert_allclose(np.asarray(res.sim3.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.sim3.t), t, atol=1e-2)


class TestAtlasSession:
    @pytest.mark.slow
    def test_occlusion_starts_and_welds_map2(self):
        """Hard 15-frame occlusion + scene jump: the engine must freeze
        map #1, initialize map #2 in the new place, and weld the two
        when the camera re-approaches map #1's territory."""
        from send_slam_tpu.io.protocol import TRACKING_OK
        from send_slam_tpu.models.system import System
        from send_slam_tpu.utils.synth import SyntheticWorld

        world = SyntheticWorld(n_points=1200)
        rng = np.random.default_rng(5)
        ptsA = rng.uniform([-6, -4.5, 3], [2, 4.5, 10], (600, 3))
        ptsB = rng.uniform([8, -4.5, 3], [16, 4.5, 10], (600, 3))
        world.points = np.concatenate([ptsA, ptsB])

        cfg = EngineConfig(
            orb=OrbConfig(n_features=512, n_levels=4),
            camera=CameraConfig(width=world.W, height=world.H,
                                fx=world.fx, fy=world.fy,
                                cx=world.cx, cy=world.cy),
            map=MapConfig(max_keyframes=48, max_landmarks=4096,
                          ba_window=4),
            tracking=TrackingConfig(pipeline_stretch=1,
                init_min_matches=40, kf_max_interval=5,
                atlas_reloc_patience=8, atlas_min_kf=5),
        )

        def cam_at(x):
            R = np.eye(3)
            c = np.array([x, 0.0, 0.0])
            return R, -R @ c

        frames = []
        # Phase A: map region A (x 0 -> 1.2).
        for k in range(45):
            R, t = cam_at(1.2 * k / 44)
            frames.append(world.render(R, t))
        # Occlusion: 15 black frames while the camera jumps to x=10.
        for k in range(15):
            frames.append(np.zeros((world.H, world.W), np.float32))
        # Phase B: initialize map #2 in region B (x 10 -> 9.2).
        for k in range(30):
            R, t = cam_at(10.0 - 0.8 * k / 29)
            frames.append(world.render(R, t))
        # Phase C: drive back toward region A (slow enough to keep
        # tracking); the weld must fire once region A features enter
        # the view and a keyframe there retrieval-hits map #1.
        for k in range(110):
            R, t = cam_at(9.2 - 8.2 * k / 109)
            frames.append(world.render(R, t))
        for k in range(10):          # hold so pending probes evaluate
            R, t = cam_at(1.0)
            frames.append(world.render(R, t))

        sys = System(cfg)
        states = []
        froze = False
        for k, img in enumerate(frames):
            out = sys.track_monocular(img, k / 30.0)
            states.append(out.tracking_state)
            froze = froze or len(sys.atlas) > 0

        assert froze, "tracking loss never froze map #1 into the atlas"
        assert sys.welds_done >= 1, \
            f"no weld (atlas={len(sys.atlas)}, states tail={states[-20:]})"
        assert len(sys.atlas) == 0
        # Tracking alive at the end, on the welded map.
        tail = states[-10:]
        assert tail.count(TRACKING_OK) >= 8, tail
