"""Multi-camera shard_map step on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig,
)
from send_slam_tpu.parallel import (
    init_multicam, make_mesh, multicam_track_step,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return EngineConfig(
        orb=OrbConfig(n_features=64, n_levels=2),
        camera=CameraConfig(width=96, height=64, fx=60.0, fy=60.0,
                            cx=48.0, cy=32.0),
        map=MapConfig(max_keyframes=8, max_landmarks=256, ba_window=4),
    )


class TestMesh:
    def test_make_mesh_1d(self):
        mesh = make_mesh(8, ("cam",))
        assert mesh.shape == {"cam": 8}

    def test_make_mesh_2d(self):
        mesh = make_mesh(8, ("cam", "feat"))
        assert mesh.shape["cam"] * mesh.shape["feat"] == 8


class TestMultiCam:
    def test_sharded_step_runs_and_aggregates(self, tiny_cfg):
        n = len(jax.devices())
        assert n == 8, "conftest must provide 8 virtual devices"
        mesh = make_mesh(n, ("cam",))
        state = init_multicam(tiny_cfg, n)
        step = multicam_track_step(tiny_cfg, mesh, insert_keyframes=True)

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.uniform(0, 255, (n, 64, 96)).astype(np.float32))
        tss = jnp.zeros((n,), jnp.float32)
        state2, n_inl, total, all_t = step(state, imgs, tss)
        # Structure: shapes survive, total is the psum of per-cam counts.
        assert n_inl.shape == (n,)
        assert all_t.shape == (n, 3)
        assert int(total) == int(np.asarray(n_inl).sum())
        # Each camera inserted a keyframe.
        assert np.asarray(state2.maps.n_kf).tolist() == [1] * n

    def test_two_steps_progress_keyframes(self, tiny_cfg):
        n = len(jax.devices())
        mesh = make_mesh(n, ("cam",))
        state = init_multicam(tiny_cfg, n)
        step = multicam_track_step(tiny_cfg, mesh, insert_keyframes=True)
        rng = np.random.default_rng(1)
        for i in range(2):
            imgs = jnp.asarray(
                rng.uniform(0, 255, (n, 64, 96)).astype(np.float32))
            state, _, _, _ = step(state, imgs,
                                  jnp.full((n,), float(i), jnp.float32))
        assert np.asarray(state.maps.n_kf).tolist() == [2] * n
