"""Covisibility graph, redundant-keyframe culling, table compaction.

Unit-level: hand-built observation tables with known shared-landmark
structure. Session-level: a sequence several times longer than
max_keyframes must track to the end — culling + compaction keep the
fixed-capacity table from freezing (ORB-SLAM3 LocalMapping keyframe
culling, slam_backends/orb_slam_3/CMakeLists.txt:50)."""

import numpy as np
import jax.numpy as jnp
import pytest

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.models.covisibility import (
    chain_edges, compact_keyframes, covis_edges, covis_window_ids,
    covisibility_matrix, cull_redundant_keyframes, keyframe_redundancy,
)
from send_slam_tpu.models.map_state import empty_map, insert_keyframe

N_KP = 16


def _mini_map(obs_rows, chain_breaks=None):
    """Build a map with one keyframe per obs row (length-N_KP int
    lists, -1 = unassociated). Landmarks referenced are marked valid."""
    MK = max(8, len(obs_rows))
    m = empty_map(MapConfig(max_keyframes=MK, max_landmarks=64,
                            ba_window=4), N_KP)
    lm_used = set()
    for k, row in enumerate(obs_rows):
        row = np.asarray(row, np.int32)
        uv = np.random.default_rng(k).uniform(0, 100, (N_KP, 2))
        desc = np.zeros((N_KP, 8), np.uint32)
        cb = bool(chain_breaks[k]) if chain_breaks is not None else False
        m, _ = insert_keyframe(
            m, jnp.eye(3), jnp.zeros(3), float(k),
            jnp.asarray(uv, jnp.float32), jnp.asarray(desc),
            jnp.zeros((N_KP,), jnp.int32), jnp.ones((N_KP,), bool),
            jnp.asarray(row), chain_break=cb)
        lm_used.update(int(x) for x in row if x >= 0)
    lm_valid = np.zeros(64, bool)
    for l in lm_used:
        lm_valid[l] = True
    ref = np.where(lm_valid, 0, -1).astype(np.int32)
    m = m._replace(lm_valid=jnp.asarray(lm_valid),
                   lm_ref_kf=jnp.asarray(ref),
                   lm_pos=jnp.asarray(
                       np.random.default_rng(0).normal(size=(64, 3)),
                       jnp.float32))
    return m


def _row(ids):
    """N_KP-long obs row observing the given landmark ids."""
    row = [-1] * N_KP
    for i, l in enumerate(ids):
        row[i] = l
    return row


class TestCovisibilityMatrix:
    def test_shared_counts(self):
        m = _mini_map([
            _row([0, 1, 2, 3]),
            _row([2, 3, 4]),
            _row([10, 11]),
        ])
        C = np.asarray(covisibility_matrix(m))
        assert C[0, 1] == 2        # landmarks 2, 3 shared
        assert C[1, 0] == 2
        assert C[0, 2] == 0
        assert C[0, 0] == 0        # diagonal zeroed

    def test_window_ids_newest_plus_top(self):
        m = _mini_map([
            _row([0, 1, 2, 3]),
            _row([0, 1, 2]),       # 3 shared with KF3
            _row([9]),             # nothing shared
            _row([0, 1, 2, 4]),    # newest
        ])
        ids, ok = covis_window_ids(m, W=3)
        ids = np.asarray(ids)[np.asarray(ok)]
        assert 3 in ids            # newest always present
        assert set(ids) <= {0, 1, 3}
        assert list(ids) == sorted(ids)

    def test_covis_edges_valid_pairs(self):
        m = _mini_map([
            _row([0, 1, 2, 3, 4]),
            _row([9]),
            _row([0, 1, 2, 3, 4]),  # strongly covisible with KF0
        ])
        e = covis_edges(m, top_k=2, min_shared=3.0)
        pairs = {(int(i), int(j))
                 for i, j, v in zip(e.i, e.j, e.valid) if bool(v)}
        assert (0, 2) in pairs or (2, 0) in pairs
        for i, j in pairs:
            assert abs(i - j) > 1


class TestChainEdges:
    def test_skips_culled_and_breaks(self):
        m = _mini_map([
            _row([0, 1]), _row([1, 2]), _row([2, 3]), _row([3, 4]),
        ], chain_breaks=[False, False, True, False])
        # Cull KF1: chain must link 0 -> 2 ... but 2 is a break.
        m = m._replace(kf_valid=m.kf_valid.at[1].set(False))
        e = chain_edges(m)
        live = {(int(i), int(j))
                for i, j, v in zip(e.i, e.j, e.valid) if bool(v)}
        assert (2, 3) in live
        assert (0, 2) not in live   # break at KF2 drops its incoming edge
        assert all(j != 1 and i != 1 for i, j in live)


class TestKeyframeCulling:
    def _redundant_setup(self):
        # KF2 observes only landmarks seen by 3+ other keyframes.
        shared = [0, 1, 2, 3]
        return _mini_map([
            _row(shared + [10]),
            _row(shared + [11]),
            _row(shared),            # fully redundant
            _row(shared + [12]),
            _row([20, 21, 22]),      # newest, protected anyway
        ])

    def test_redundancy_fraction(self):
        m = self._redundant_setup()
        frac = np.asarray(keyframe_redundancy(m))
        assert frac[2] == 1.0
        assert frac[4] == 0.0

    def test_cull_marks_and_protects(self):
        m = self._redundant_setup()
        m2, n = cull_redundant_keyframes(m, keep_latest=1)
        valid = np.asarray(m2.kf_valid)
        assert int(n) >= 1
        assert not valid[2]
        assert valid[0] and valid[1] and valid[4]   # protected
        # Culled keyframe's observation row is cleared.
        assert np.all(np.asarray(m2.kf_obs_lm[2]) == -1)
        # Landmarks remain observed by the survivors.
        assert np.all(np.asarray(m2.lm_valid) == np.asarray(m.lm_valid))

    def test_compaction_packs_and_remaps(self):
        m = self._redundant_setup()
        m = m._replace(lm_ref_kf=jnp.asarray(
            [3 if v else -1 for v in np.asarray(m.lm_valid)],
            jnp.int32))
        m2, _ = cull_redundant_keyframes(m, keep_latest=1)
        m3, n_valid = compact_keyframes(m2)
        n_valid = int(n_valid)
        assert n_valid == 4
        valid = np.asarray(m3.kf_valid)
        assert valid[:n_valid].all() and not valid[n_valid:].any()
        # Temporal order preserved: timestamps strictly increasing.
        ts = np.asarray(m3.kf_timestamp[:n_valid])
        assert np.all(np.diff(ts) > 0)
        # lm_ref_kf followed its keyframe: old slot 3 -> new slot 2.
        ref = np.asarray(m3.lm_ref_kf)
        assert np.all(ref[np.asarray(m3.lm_valid)] == 2)
        # Obs rows moved with their keyframes: old KF3's uniques live
        # in new slot 2.
        assert 12 in set(np.asarray(m3.kf_obs_lm[2]))


class TestLongSession:
    @pytest.mark.slow
    def test_five_times_capacity_tracks_to_end(self):
        """VERDICT round-1 item 4: a sequence ~5x max_keyframes long
        must keep tracking — culling + compaction recycle slots so the
        map never freezes."""
        from send_slam_tpu.io.protocol import TRACKING_OK
        from send_slam_tpu.models.system import System
        from send_slam_tpu.utils.synth import SyntheticWorld
        from scipy.spatial.transform import Rotation

        world = SyntheticWorld(n_points=900)
        cfg = EngineConfig(
            orb=OrbConfig(n_features=512, n_levels=4),
            camera=CameraConfig(width=world.W, height=world.H,
                                fx=world.fx, fy=world.fy,
                                cx=world.cx, cy=world.cy),
            map=MapConfig(max_keyframes=10, max_landmarks=2048,
                          ba_window=4),
            tracking=TrackingConfig(init_min_matches=50,
                                    kf_max_interval=6,
                                    # Deterministic drain: decision
                                    # timing must not depend on machine
                                    # load (fetch-future completion).
                                    pipeline_depth=1,
                                    pipeline_stretch=1),
        )
        n_frames = 140
        ts, Rs, tls = [], [], []
        for k in range(n_frames):
            a = k / (n_frames - 1)
            c = np.array([3.5 * a, 0.1 * np.sin(2 * np.pi * a), 0.5 * a])
            Rwc = Rotation.from_euler("y", -0.3 * a).as_matrix()
            R = Rwc.T
            ts.append(k / 30.0)
            Rs.append(R)
            tls.append(-R @ c)

        sys = System(cfg)
        states = []
        for k in range(n_frames):
            out = sys.track_monocular(world.render(Rs[k], tls[k]),
                                      float(ts[k]))
            states.append(out.tracking_state)
        # More keyframes inserted than the table holds -> culling +
        # compaction actually ran.
        assert sys._n_kf_host > cfg.map.max_keyframes, sys._n_kf_host
        assert sys._slots_used < sys._n_kf_host
        # Sustained tracking across the whole 5x-capacity run…
        assert sum(s == TRACKING_OK for s in states) > 100, \
            sum(s == TRACKING_OK for s in states)
        # …and healthy at the end: round 2's bar was liveness-only
        # (3 of the last 10 OK) because the tail flickered with the
        # init lottery; the round-3 deterministic schedule + scored
        # init hold a solid tail.
        tail = states[-10:]
        assert tail.count(TRACKING_OK) >= 7, tail
        assert states[-1] in (2, 3), states[-5:]
