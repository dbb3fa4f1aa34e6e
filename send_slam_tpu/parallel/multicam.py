"""Multi-camera sharded SLAM step over a device mesh.

Each camera lane runs the FULL per-frame pipeline (ORB extraction ->
two-pass tracking -> optional keyframe insertion + triangulation +
local BA) as a shard of the "cam" mesh axis; cross-camera aggregation
(total inliers via ``psum``, the all-camera pose table via
``all_gather``) rides the ICI. This is the config-5 topology of
BASELINE.json (parallel trackers with shared-map merge): the per-chip
math is identical to the single-camera System, so scaling cameras is
purely a sharding decision, not new code.

Design notes (tpu-first):
- the map lives sharded: every leaf of MapState gains a leading cam
  axis and never leaves its device;
- decisions that the single-camera System takes on the host (insert a
  keyframe?) are taken in-shard with ``lax.cond``-free masking: the
  keyframe step runs every call in the step that requests it, which
  keeps the program identical across shards (SPMD requires that);
- collectives are explicit and minimal: one psum + one all_gather per
  step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from send_slam_tpu.config import EngineConfig
from send_slam_tpu.models.frame import make_frame
from send_slam_tpu.models.local_ba import local_bundle_adjustment
from send_slam_tpu.models.local_mapping import (
    insert_keyframe_with_triangulation,
)
from send_slam_tpu.models.map_state import (
    MapState, empty_map, update_landmark_stats,
)
from send_slam_tpu.models.tracking import track_frame


class MultiCamState(NamedTuple):
    maps: MapState          # every leaf has leading (n_cam,) axis
    R: jnp.ndarray          # (n_cam, 3, 3) current camera-from-world
    t: jnp.ndarray          # (n_cam, 3)


def init_multicam(cfg: EngineConfig, n_cam: int) -> MultiCamState:
    one = empty_map(cfg.map, cfg.orb.n_features)
    maps = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_cam,) + x.shape), one)
    return MultiCamState(
        maps=maps,
        R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (n_cam, 1, 1)),
        t=jnp.zeros((n_cam, 3), jnp.float32),
    )


def multicam_track_step(cfg: EngineConfig, mesh: Mesh,
                        insert_keyframes: bool = True):
    """Build the jitted sharded step.

    Returns step(state, imgs (n_cam,H,W), timestamps (n_cam,)) ->
    (state', n_inliers (n_cam,), total_inliers (), all_t (n_cam,3)).
    """
    cam = cfg.camera
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    jnp.float32)

    def per_cam(img, ts, R_pred, t_pred, m: MapState):
        frame = make_frame(img, ts, cfg.orb, cam)
        res = track_frame(
            R_pred, t_pred, m.lm_pos, m.lm_desc, m.lm_valid,
            frame.uv_und, frame.feat.desc, frame.feat.valid,
            frame.feat.octave,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            cfg.tracking, scale_factor=cfg.orb.scale_factor)
        m = update_landmark_stats(m, res.in_view, res.inlier)
        if insert_keyframes:
            m, _, _ = insert_keyframe_with_triangulation(
                m, res.R, res.t, frame, res.matches.idx,
                res.matches.valid & res.inlier, K, cfg.tracking)
            m = local_bundle_adjustment(m, K, cfg.map)
        return m, res.R, res.t, res.n_inliers

    def sharded(imgs, tss, Rs, ts_, maps):
        # Local block: (cams_per_device, ...). vmap the pure per-cam
        # pipeline, then aggregate across the mesh axis.
        m, R, t, n_inl = jax.vmap(per_cam)(imgs, tss, Rs, ts_, maps)
        total = jax.lax.psum(jnp.sum(n_inl), "cam")
        all_t = jax.lax.all_gather(t, "cam", tiled=True)   # (n_cam, 3)
        return m, R, t, n_inl, total, all_t

    spec = P("cam")
    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, P(), P()),
        check_vma=False)

    @jax.jit
    def step(state: MultiCamState, imgs, timestamps):
        maps, R, t, n_inl, total, all_t = fn(
            imgs, timestamps, state.R, state.t, state.maps)
        return MultiCamState(maps=maps, R=R, t=t), n_inl, total, all_t

    return step
