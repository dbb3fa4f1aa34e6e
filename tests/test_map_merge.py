"""Cross-camera shared-map merge: Sim3 alignment + deduplicated import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.models.map_state import empty_map
from send_slam_tpu.parallel.map_merge import (
    merge_from_partner, multicam_merge_step,
)

RNG = np.random.default_rng(21)


def make_pair(n_shared=120, n_extra=60, ML=512):
    """My map + a partner map of the same scene content under a known
    Sim3 gauge difference, sharing n_shared landmarks."""
    cfg = MapConfig(max_keyframes=8, max_landmarks=ML)
    world = RNG.uniform([-4, -3, 3], [4, 3, 9],
                        (n_shared + n_extra, 3)).astype(np.float32)
    descs = RNG.integers(0, 2**32, (n_shared + n_extra, 8), dtype=np.uint32)

    mine = empty_map(cfg, 64)
    mine = mine._replace(
        lm_pos=mine.lm_pos.at[:n_shared].set(world[:n_shared]),
        lm_desc=mine.lm_desc.at[:n_shared].set(descs[:n_shared]),
        lm_valid=mine.lm_valid.at[:n_shared].set(True),
        lm_ref_kf=mine.lm_ref_kf.at[:n_shared].set(0),
    )
    # Partner gauge: scale 1.7, rotation, translation.
    Rg = Rotation.from_rotvec([0.1, -0.2, 0.15]).as_matrix().astype(np.float32)
    s, tg = 1.7, np.array([0.5, -1.2, 2.0], np.float32)
    # partner stores (their frame): X_p = S_pm(X_m): we define partner
    # positions so that my frame = S(partner): X_m = s R X_p + t.
    part_world = ((world - tg) @ np.linalg.inv(s * Rg).T).astype(np.float32)
    p_pos = np.zeros((ML, 3), np.float32)
    p_desc = np.zeros((ML, 8), np.uint32)
    p_valid = np.zeros((ML,), bool)
    p_pos[:len(part_world)] = part_world
    p_desc[:len(descs)] = descs
    p_valid[:len(descs)] = True
    return mine, (jnp.asarray(p_pos), jnp.asarray(p_desc),
                  jnp.asarray(p_valid)), (s, Rg, tg), world


class TestMergeFromPartner:
    def test_aligns_and_imports_novel(self):
        mine, partner, gauge, world = make_pair()
        m2, ok, n_imp = merge_from_partner(
            mine, *partner, jax.random.PRNGKey(0), TrackingConfig())
        assert bool(ok)
        # ~60 extra landmarks imported, not the 120 shared ones.
        assert 40 <= int(n_imp) <= 70, int(n_imp)
        # Imported positions land near the true world positions.
        new = np.asarray(m2.lm_valid) & ~np.asarray(mine.lm_valid)
        pos = np.asarray(m2.lm_pos)[new]
        from scipy.spatial import cKDTree
        d, _ = cKDTree(world[120:]).query(pos)
        assert np.median(d) < 0.05, np.median(d)
        # Imports are exempt from zero-obs pruning.
        from send_slam_tpu.models.map_state import prune_zero_obs_landmarks
        assert np.asarray(m2.lm_ref_kf)[new].max() < 0
        m3 = prune_zero_obs_landmarks(m2)
        assert int(m3.lm_valid.sum() >= m2.lm_valid[new].sum())

    def test_no_import_on_unrelated_maps(self):
        mine, _, _, _ = make_pair()
        ML = mine.max_landmarks
        p_pos = jnp.asarray(RNG.uniform(-5, 5, (ML, 3)), jnp.float32)
        p_desc = jnp.asarray(RNG.integers(0, 2**32, (ML, 8), dtype=np.uint32))
        p_valid = jnp.ones((ML,), bool)
        m2, ok, n_imp = merge_from_partner(
            mine, p_pos, p_desc, p_valid, jax.random.PRNGKey(1),
            TrackingConfig())
        assert not bool(ok)
        assert int(n_imp) == 0


class TestShardedMerge:
    def test_ring_merge_on_mesh(self):
        from send_slam_tpu.parallel import init_multicam, make_mesh
        n = len(jax.devices())
        cfg = EngineConfig(
            orb=OrbConfig(n_features=64, n_levels=2),
            camera=CameraConfig(width=96, height=64, fx=60.0, fy=60.0,
                                cx=48.0, cy=32.0),
            map=MapConfig(max_keyframes=8, max_landmarks=256))
        mesh = make_mesh(n, ("cam",))
        state = init_multicam(cfg, n)
        # Give every lane the same landmark cloud (identity gauge) with
        # distinct extra content per lane.
        rng = np.random.default_rng(0)
        shared = rng.uniform([-4, -3, 3], [4, 3, 9], (60, 3)).astype(np.float32)
        sdesc = rng.integers(0, 2**32, (60, 8), dtype=np.uint32)
        maps = state.maps
        lm_pos = np.array(np.asarray(maps.lm_pos))
        lm_desc = np.array(np.asarray(maps.lm_desc))
        lm_valid = np.array(np.asarray(maps.lm_valid))
        lm_ref = np.array(np.asarray(maps.lm_ref_kf))
        for c in range(n):
            extra = rng.uniform([-4, -3, 3], [4, 3, 9], (20, 3)).astype(np.float32)
            edesc = rng.integers(0, 2**32, (20, 8), dtype=np.uint32)
            lm_pos[c, :60] = shared
            lm_pos[c, 60:80] = extra
            lm_desc[c, :60] = sdesc
            lm_desc[c, 60:80] = edesc
            lm_valid[c, :80] = True
            lm_ref[c, :80] = 0
        maps = maps._replace(
            lm_pos=jnp.asarray(lm_pos), lm_desc=jnp.asarray(lm_desc),
            lm_valid=jnp.asarray(lm_valid), lm_ref_kf=jnp.asarray(lm_ref))

        step = multicam_merge_step(cfg, mesh)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        maps2, ok, n_imp = step(maps, keys)
        assert np.asarray(ok).all()
        # Each lane imported its ring neighbour's ~20 extras.
        imported = np.asarray(n_imp)
        assert (imported >= 10).all(), imported

    def test_ring_merge_lanes_exceed_devices(self):
        """4 lanes on a 1-device mesh must behave like 4 lanes on 4
        devices: the shard body receives an (L, ...) block and merges
        every local lane with its GLOBAL ring successor. The original
        body assumed L == 1, merged lane 0 with itself and dropped the
        rest — caught on the real single-chip TPU by the round-5 lane
        run (scripts/tpu_lane_run.py)."""
        from send_slam_tpu.parallel import init_multicam, make_mesh
        n = 4
        cfg = EngineConfig(
            orb=OrbConfig(n_features=64, n_levels=2),
            camera=CameraConfig(width=96, height=64, fx=60.0, fy=60.0,
                                cx=48.0, cy=32.0),
            map=MapConfig(max_keyframes=8, max_landmarks=256))
        mesh = make_mesh(1, ("cam",))
        state = init_multicam(cfg, n)
        rng = np.random.default_rng(0)
        shared = rng.uniform([-4, -3, 3], [4, 3, 9], (60, 3)).astype(np.float32)
        sdesc = rng.integers(0, 2**32, (60, 8), dtype=np.uint32)
        maps = state.maps
        lm_pos = np.array(np.asarray(maps.lm_pos))
        lm_desc = np.array(np.asarray(maps.lm_desc))
        lm_valid = np.array(np.asarray(maps.lm_valid))
        lm_ref = np.array(np.asarray(maps.lm_ref_kf))
        for c in range(n):
            extra = rng.uniform([-4, -3, 3], [4, 3, 9], (20, 3)).astype(np.float32)
            edesc = rng.integers(0, 2**32, (20, 8), dtype=np.uint32)
            lm_pos[c, :60] = shared
            lm_pos[c, 60:80] = extra
            lm_desc[c, :60] = sdesc
            lm_desc[c, 60:80] = edesc
            lm_valid[c, :80] = True
            lm_ref[c, :80] = 0
        maps = maps._replace(
            lm_pos=jnp.asarray(lm_pos), lm_desc=jnp.asarray(lm_desc),
            lm_valid=jnp.asarray(lm_valid), lm_ref_kf=jnp.asarray(lm_ref))

        step = multicam_merge_step(cfg, mesh)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        maps2, ok, n_imp = step(maps, keys)
        assert np.asarray(maps2.lm_valid).shape[0] == n
        assert np.asarray(ok).shape == (n,)
        assert np.asarray(ok).all()
        imported = np.asarray(n_imp)
        assert (imported >= 10).all(), imported
