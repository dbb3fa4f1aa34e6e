"""The System facade: host-side orchestration of the jitted SLAM steps.

TPU-native re-design of ORB_SLAM3::System + Tracking's state machine
(slam_backends/orb_slam_3/CMakeLists.txt:48-49; constructed by the
reference adapter at orbslam3_mono_networked.cc:511 and driven via
TrackMonocular at …cc:594). Key architectural departures:

- No threads for tracking/mapping: the per-frame hot path is ONE fused
  jitted dispatch (extract -> match -> pose GN); keyframe insertion +
  triangulation + local BA are separate jitted steps invoked at the
  keyframe rate. Data-dependent *decisions* (initialized? lost? new
  keyframe?) happen here on the host between dispatches on a handful
  of scalars; all *math* stays on device with static shapes.
- The map is a fixed-capacity pytree (models/map_state.py) living on
  device; the host never materializes it.

Public API mirrors the reference backend's usage:
``track_monocular(gray, timestamp) -> TrackOutput`` (pose +
tracking_state, the contents of the pose packet …cc:225-282),
``get_tracking_state()``, ``shutdown()``/``keyframe_trajectory()``
(SaveKeyFrameTrajectoryTUM, …cc:670).
"""

from __future__ import annotations

import functools
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.config import EngineConfig
from send_slam_tpu.geometry.se3 import (
    quat_from_rotmat, se3_compose, se3_inverse,
)
from send_slam_tpu.io.protocol import (
    TRACKING_LOST, TRACKING_NOT_INITIALIZED, TRACKING_NO_IMAGES_YET,
    TRACKING_OK, TRACKING_RECENTLY_LOST,
)
from send_slam_tpu.models.frame import Frame, make_frame
from send_slam_tpu.models.initializer import two_view_init
from send_slam_tpu.models.local_mapping import (
    insert_keyframe_with_triangulation,
)
from send_slam_tpu.models.local_ba import local_bundle_adjustment
from send_slam_tpu.models.map_state import (
    MapState, empty_map, insert_keyframe,
    prune_zero_obs_landmarks, update_landmark_stats,
)
from send_slam_tpu.models.tracking import track_frame


class TrackOutput(NamedTuple):
    """Host-side result of one frame: everything the pose packet needs."""

    tracking_state: int
    position: Optional[np.ndarray]      # Twc translation (3,)
    orientation: Optional[np.ndarray]   # Twc unit quaternion (x,y,z,w)
    n_inliers: int
    timestamp: float


class System:
    """Monocular TPU SLAM engine."""

    def __init__(self, config: EngineConfig):
        self.cfg = config
        cam = config.camera
        self._K = jnp.asarray(
            [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32)
        self._key = jax.random.PRNGKey(0)

        # --- jitted steps -------------------------------------------------
        orb, tr = config.orb, config.tracking

        self._make_frame = jax.jit(
            lambda img, ts: make_frame(img, ts, orb, cam))

        def _init_step(frame_a: Frame, frame_b: Frame, key):
            return two_view_init(
                frame_a.uv_und, frame_a.feat.desc, frame_a.feat.valid,
                frame_a.feat.angle,
                frame_b.uv_und, frame_b.feat.desc, frame_b.feat.valid,
                frame_b.feat.angle,
                self._K, key, tr)
        self._init_step = jax.jit(_init_step)

        def _track_step(m: MapState, R_pred, t_pred, frame: Frame, radius):
            return track_frame(
                R_pred, t_pred,
                m.lm_pos, m.lm_desc, m.lm_valid,
                frame.uv_und, frame.feat.desc, frame.feat.valid,
                frame.feat.octave,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                tr, scale_factor=orb.scale_factor, search_radius=radius)
        self._track_step = jax.jit(_track_step, static_argnames=("radius",))
        self._update_stats = jax.jit(update_landmark_stats)

        def _frame_step(m: MapState, R_prev, t_prev, R_prev2, t_prev2,
                        has_vel, img, ts):
            """The fused per-frame hot path, ONE dispatch with NO host
            inputs derived from device reads: the constant-velocity
            prediction is computed in-graph from the device-side pose
            chain, so consecutive dispatches chain asynchronously and
            the host never blocks inside the tracking loop (the remote-
            device sync latency makes this matter more than FLOPs).
            Returns (map', frame, res, summary) where summary is the
            8-float vector [n_inliers, twc(3), quat(4)] — the only
            thing the host ever fetches, one frame late."""
            img_f = img.astype(jnp.float32)
            # Damped velocity prediction: T_vel = exp(a·log(T_prev ∘
            # T_prev2^-1)) — see TrackingConfig.velocity_damping.
            from send_slam_tpu.geometry.se3 import se3_exp, se3_log
            R2i, t2i = se3_inverse(R_prev2, t_prev2)
            Rv, tv = se3_compose(R_prev, t_prev, R2i, t2i)
            xi = se3_log(Rv, tv) * tr.velocity_damping
            Rv, tv = se3_exp(xi)
            Rp, tp = se3_compose(Rv, tv, R_prev, t_prev)
            R_pred = jnp.where(has_vel, Rp, R_prev)
            t_pred = jnp.where(has_vel, tp, t_prev)

            frame = make_frame(img_f, ts, orb, cam)
            res = track_frame(
                R_pred, t_pred,
                m.lm_pos, m.lm_desc, m.lm_valid,
                frame.uv_und, frame.feat.desc, frame.feat.valid,
                frame.feat.octave,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                tr, scale_factor=orb.scale_factor,
                search_radius=tr.search_radius_px,
                R_rescue=R_prev, t_rescue=t_prev,
                lm_normal=m.lm_normal, lm_dist_min=m.lm_dist_min,
                lm_dist_max=m.lm_dist_max, n_levels=orb.n_levels)
            m = update_landmark_stats(m, res.in_view, res.inlier)

            Rwc, twc = se3_inverse(res.R, res.t)
            quat = quat_from_rotmat(Rwc)
            summary = jnp.concatenate([
                res.n_inliers[None].astype(jnp.float32), twc, quat])
            return m, frame, res, summary
        self._frame_step = jax.jit(_frame_step)

        def _bootstrap_map(m: MapState, fa: Frame, fb: Frame, init_res):
            """Create KF0 (identity) + KF1 (R,t) + initial landmarks."""
            N = fa.feat.capacity
            eye = jnp.eye(3, dtype=jnp.float32)
            zero = jnp.zeros(3, jnp.float32)
            no_obs = jnp.full((N,), -1, jnp.int32)
            m, kf0 = insert_keyframe(
                m, eye, zero, fa.timestamp, fa.uv_und, fa.feat.desc,
                fa.feat.octave, fa.feat.valid, no_obs)
            m, kf1 = insert_keyframe(
                m, init_res.R, init_res.t, fb.timestamp, fb.uv_und,
                fb.feat.desc, fb.feat.octave, fb.feat.valid, no_obs)
            good = init_res.point_ok & init_res.matches.valid
            idx_b = jnp.clip(init_res.matches.idx, 0, N - 1)
            from send_slam_tpu.models.map_state import add_landmarks
            # Viewing stats from the reference view (KF0 at origin).
            X = init_res.points
            dist = jnp.maximum(jnp.linalg.norm(X, axis=-1), 1e-6)
            normal = X / dist[:, None]
            oct_a = fa.feat.octave.astype(jnp.float32)
            dmax = dist * (orb.scale_factor ** oct_a)
            dmin = dmax / (orb.scale_factor ** (orb.n_levels - 1))
            m, _ = add_landmarks(
                m, X, fa.feat.desc, good, kf0,
                kf0, jnp.arange(N, dtype=jnp.int32), kf1, idx_b,
                normal=normal, dist_min=dmin, dist_max=dmax)
            # Initial refinement (ORB-SLAM's post-init global BA):
            # KF0 fixed, KF1 + structure free.
            m = local_bundle_adjustment(m, self._K, config.map, iters=10,
                                        n_fixed=1)
            return m
        self._bootstrap_map = jax.jit(_bootstrap_map)

        def _insert_kf_step(m: MapState, R, t, frame: Frame,
                            match_idx, match_inlier, chain_break):
            return insert_keyframe_with_triangulation(
                m, R, t, frame, match_idx, match_inlier, self._K, tr,
                chain_break=chain_break,
                scale_factor=orb.scale_factor, n_levels=orb.n_levels)
        self._insert_kf_step = jax.jit(_insert_kf_step)

        def _reloc_step(m: MapState, frame: Frame, key):
            """Retrieval-guided relocalization (the candidate-keyframe
            structure of Tracking::Relocalization): the best keyframe by
            signature provides the pose prior, then the standard
            two-pass track step runs with a wide search window. The
            prior-free PnP RANSAC (models/relocalize.py) remains
            available for kidnapped-robot cases with no retrieval hit."""
            from send_slam_tpu.models.retrieval import frame_signature
            sig = frame_signature(frame.feat.desc, frame.feat.valid)
            scores = jnp.where(m.kf_valid, m.kf_signature @ sig, -1.0)
            best = jnp.argmax(scores)
            res = track_frame(
                m.kf_R[best], m.kf_t[best],
                m.lm_pos, m.lm_desc, m.lm_valid,
                frame.uv_und, frame.feat.desc, frame.feat.valid,
                frame.feat.octave,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                tr, scale_factor=orb.scale_factor, search_radius=64.0)
            return res, scores[best]
        self._reloc_step = jax.jit(_reloc_step)

        from send_slam_tpu.models.covisibility import (
            compact_keyframes, covis_window_ids, cull_redundant_keyframes,
        )

        def _local_ba_step(m: MapState):
            # ORB-SLAM's LocalMapping sequence at keyframe rate: local
            # BA over the COVISIBILITY window of the new keyframe (not
            # pure recency — corrections propagate through shared
            # structure), outlier-obs pruning, then redundant-keyframe
            # culling (CMakeLists.txt:50).
            ids, _ok = covis_window_ids(m, config.map.ba_window)
            m = local_bundle_adjustment(m, self._K, config.map,
                                        window_ids=ids)
            m = prune_zero_obs_landmarks(m)
            m, _ncull = cull_redundant_keyframes(m, max_cull=2)
            return m
        self._local_ba_step = jax.jit(_local_ba_step)
        self._compact_step = jax.jit(compact_keyframes)
        # Capacity-pressure cull: when the table fills and no keyframe
        # crossed the 90% redundancy bar organically, drop the single
        # MOST redundant unprotected keyframe so the session can
        # continue (the capacity bounds the active window, never the
        # session length).
        self._forced_cull_step = jax.jit(
            lambda m: cull_redundant_keyframes(
                m, redundancy_th=0.0, keep_latest=3, max_cull=1))

        from send_slam_tpu.models.loop_closing import (
            apply_loop_correction, compute_loop_sim3, loop_candidate,
        )
        self._loop_candidate = jax.jit(
            lambda m, kf_id: loop_candidate(m, kf_id, tr.loop_min_gap_kf))
        self._loop_sim3 = jax.jit(
            lambda m, kf, cand, key: compute_loop_sim3(
                m, kf, cand, key, tr, min_matches=tr.loop_min_matches))
        self._loop_apply = jax.jit(
            lambda m, kf, cand, loop: apply_loop_correction(
                m, kf, cand, loop))
        from send_slam_tpu.models.local_ba import (
            global_bundle_adjustment, wide_bundle_adjustment,
        )
        self._wide_ba_step = jax.jit(
            lambda m: wide_bundle_adjustment(m, self._K, config.map))
        self._global_ba_step = jax.jit(
            lambda m: global_bundle_adjustment(m, self._K, config.map))
        self.loops_closed = 0

        # Atlas multi-map (models/atlas.py): frozen MapStates parked on
        # device; survives reset().
        from send_slam_tpu.models.atlas import (
            best_cross_map_candidate, cross_map_sim3, weld_maps,
        )
        self._atlas_cand = jax.jit(best_cross_map_candidate)
        self._atlas_sim3 = jax.jit(
            lambda a, f, ka, kf, key: cross_map_sim3(
                a, f, ka, kf, key, tr,
                min_matches=tr.loop_min_matches))
        self._atlas_weld = jax.jit(weld_maps)
        self.atlas: List[MapState] = []
        self.welds_done = 0

        # Device->host fetches run on worker threads so their latency
        # (per-call RTT on a remote-attached device, occasionally
        # seconds through the relay) overlaps with dispatch instead of
        # blocking the frame loop. copy_to_host_async is NOT a reliable
        # prefetch on every backend; a thread doing the blocking read
        # is. The GIL releases inside the transfer, so this genuinely
        # parallelizes.
        self._fetch_pool = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="slam-fetch")

        self.reset()

    # ------------------------------------------------------------------

    def warmup(self, image_dtype=np.uint8) -> None:
        """Compile every jitted program the runtime can hit — one dummy
        call each — so no XLA compilation lands mid-sequence.

        The reference pays its analogous cost (vocabulary load + ORB
        pyramid allocations) inside System's constructor before the
        first TrackMonocular (orbslam3_mono_networked.cc:511); here the
        startup cost is the XLA compiles. Without this, the first
        keyframe insertion / local BA / wide BA / loop-retrieval call
        each stall the frame loop for seconds of compile time (on a
        remote-attached device far more), which is exactly the
        median-vs-mean gap the round-1 bench showed.

        ``image_dtype`` must match what ``track_monocular`` will be fed
        (the jit cache is keyed on it): cameras deliver uint8.
        """
        cfg = self.cfg
        cam = cfg.camera
        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(0)

        img_f = jnp.asarray(
            rng.uniform(0, 255, (cam.height, cam.width)), jnp.float32)
        img_raw = jnp.asarray(
            rng.integers(0, 255, (cam.height, cam.width)).astype(image_dtype))
        frame = self._make_frame(img_f, 0.0)
        init_res = self._init_step(frame, frame, key)
        m = self._bootstrap_map(self.map, frame, frame, init_res)

        eye = jnp.eye(3, dtype=jnp.float32)
        zero = jnp.zeros(3, jnp.float32)
        m2, fr2, res, summary = self._frame_step(
            m, eye, zero, eye, zero, jnp.asarray(True), img_raw, 1.0)
        m3, kf_id, _ = self._insert_kf_step(
            m2, res.R, res.t, fr2, res.matches.idx,
            res.matches.valid & res.inlier, jnp.asarray(False))
        m3 = self._local_ba_step(m3)
        m3 = self._wide_ba_step(m3)
        _mf, _nc = self._forced_cull_step(m3)
        _mc, _nv = self._compact_step(m3)
        cand, score = self._loop_candidate(m3, kf_id)
        loop = self._loop_sim3(m3, kf_id, cand, key)
        m4 = self._loop_apply(m3, kf_id, cand, loop)
        m4 = self._global_ba_step(m4)
        res_r, _sc = self._reloc_step(m3, fr2, key)
        try:
            jax.block_until_ready((m4, summary, res_r))
        except Exception:
            pass
        # Drain one host fetch of the summary so the first real fetch
        # path (transfer plumbing, not just compile) is warm too.
        np.asarray(summary)

    # ------------------------------------------------------------------
    # State machine

    def reset(self) -> None:
        cfg = self.cfg
        self.map: MapState = empty_map(cfg.map, cfg.orb.n_features)
        self.state = TRACKING_NO_IMAGES_YET
        self._ref_frame: Optional[Frame] = None
        self._R = jnp.eye(3, dtype=jnp.float32)   # current Tcw
        self._t = jnp.zeros(3, jnp.float32)
        self._R2 = self._R                        # one-older pose
        self._t2 = self._t
        self._has_vel = jnp.asarray(False)
        self._vel = None                          # (Rv, tv) motion model
        self._frames_since_kf = 0
        self._inliers_at_kf = 0
        self._lost_frames = 0
        self._last_inliers = 0
        self._n_kf_host = 0        # keyframes ever inserted (monotonic)
        self._slots_used = 0       # host mirror of device n_kf (append slot)
        self._pending_loop = None
        self._loop_consistency = None   # last probe's candidate slot
        self.loop_attempts: List[tuple] = []
        # Next keyframe's incoming chain edge crosses a relocalization
        # (the relative pose there is a jump, not motion) — recorded on
        # the keyframe itself (MapState.kf_chain_break).
        self._reloc_boundary_next_kf = False
        # Pipelined tracking: in-flight frames awaiting their (lagged)
        # summary fetch. Each entry: dict(ts, frame, res, summary,
        # R_prev, t_prev) — R/t_prev are the pre-frame pose refs used
        # to rewind when the frame turns out lost.
        self._pending: List[dict] = []
        self._ready: List[TrackOutput] = []
        self._last_out: Optional[TrackOutput] = None
        self._trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self._kf_trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self._reloc_failures = 0
        self._pending_weld = None

    def get_tracking_state(self) -> int:
        return self.state

    # ------------------------------------------------------------------

    def track_monocular(self, gray: np.ndarray, timestamp: float) -> TrackOutput:
        """gray: (H, W) uint8/float — one frame. Returns the pose in
        world-from-camera convention (Twc), like the reference backend
        sends (Twc = Tcw^-1, orbslam3_mono_networked.cc:246-249)."""
        if self.state in (TRACKING_OK, TRACKING_RECENTLY_LOST):
            return self._track_pipelined(gray, timestamp)

        self._flush_pipeline()
        img = jnp.asarray(gray, jnp.float32)
        if self.state in (TRACKING_NO_IMAGES_YET, TRACKING_NOT_INITIALIZED):
            frame = self._make_frame(img, timestamp)
            self._try_initialize(frame, timestamp)
        elif self.state == TRACKING_LOST:
            frame = self._make_frame(img, timestamp)
            self._relocalize(frame, timestamp)

        if self.state == TRACKING_OK:
            pos, quat = self._twc()
            self._trajectory.append((timestamp, pos, quat))
            out = TrackOutput(TRACKING_OK, pos, quat,
                              self._last_inliers, timestamp)
            self._last_out = out
            return out
        return TrackOutput(self.state, None, None, 0, timestamp)

    # ------------------------------------------------------------------

    def _try_initialize(self, frame: Frame, timestamp: float) -> None:
        if self._ref_frame is None:
            if int(frame.feat.num_valid()) >= self.cfg.tracking.init_min_matches:
                self._ref_frame = frame
                self.state = TRACKING_NOT_INITIALIZED
            return

        self._key, sub = jax.random.split(self._key)
        res = self._init_step(self._ref_frame, frame, sub)
        if bool(res.ok):
            self.map = self._bootstrap_map(
                self.map, self._ref_frame, frame, res)
            self._R, self._t = res.R, res.t
            self._R2, self._t2 = res.R, res.t
            self._has_vel = jnp.asarray(False)
            self.state = TRACKING_OK
            self._n_kf_host = 2
            self._slots_used = 2
            self._last_inliers = int(res.n_good)
            self._inliers_at_kf = self._last_inliers
            self._frames_since_kf = 0
            ts_ref = float(np.asarray(self._ref_frame.timestamp))
            eye_p, eye_q = np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0])
            self._kf_trajectory.append((ts_ref, eye_p, eye_q))
            pos, quat = self._twc()
            self._kf_trajectory.append((timestamp, pos, quat))
        else:
            # Slide the reference forward if it is getting stale.
            ts_ref = float(np.asarray(self._ref_frame.timestamp))
            if timestamp - ts_ref > 1.0:
                self._ref_frame = frame

    def _track_pipelined(self, gray, timestamp: float) -> TrackOutput:
        """Dispatch this frame with no host sync; fetch and act on the
        PREVIOUS frame's 8-float summary (whose device->host copy has
        been in flight since its dispatch). One frame of decision lag
        buys a tracking loop that is dispatch-bound instead of
        sync-latency-bound — on a remote-attached TPU that is the
        difference between ~8 fps and real-time."""
        arr = jnp.asarray(gray)
        R_prev, t_prev = self._R, self._t
        m2, frame, res, summary = self._frame_step(
            self.map, self._R, self._t, self._R2, self._t2,
            self._has_vel, arr, timestamp)
        fut = self._fetch_pool.submit(np.asarray, summary)
        self._pending.append(dict(
            ts=timestamp, frame=frame, res=res, summary=summary,
            future=fut, R_prev=R_prev, t_prev=t_prev))
        # Advance the device-side pose chain speculatively.
        self._R2, self._t2 = self._R, self._t
        self._R, self._t = res.R, res.t
        self._has_vel = jnp.asarray(True)
        self.map = m2

        # Elastic drain: pop lagged entries whose background fetch has
        # landed. The fetch threads absorb the device->host RTT (and
        # the occasional seconds-long relay stall) while this loop
        # keeps dispatching; only a pipeline backed up beyond
        # 4x pipeline_depth blocks on the oldest fetch. (Round 1
        # stacked pending summaries into a NEW device array and synced
        # on that — a full freshly-computed-value fetch per drain and
        # the main median-vs-mean gap.)
        depth = self.cfg.tracking.pipeline_depth
        stretch = self.cfg.tracking.pipeline_stretch
        while len(self._pending) > depth:
            if self.state not in (TRACKING_OK, TRACKING_RECENTLY_LOST) \
                    or not self._pending:
                break
            head = self._pending[0]
            if not head["future"].done() \
                    and len(self._pending) <= stretch * depth:
                break  # not ready; stretch the pipeline instead
            self._ready.append(self._process_lagged())
        if self._ready:
            return self._ready.pop(0)
        # Pipeline warming up: repeat the last known output verbatim
        # (with ITS timestamp — re-stamping a stale pose corrupts
        # trajectory evaluation).
        if self._last_out is not None:
            return self._last_out
        return TrackOutput(self.state, None, None, 0, timestamp)

    def _process_lagged(self, summary_np=None) -> TrackOutput:
        ent = self._pending.pop(0)
        tr = self.cfg.tracking
        if summary_np is not None:
            s = summary_np
        elif "future" in ent:
            s = ent["future"].result()
        else:
            s = np.asarray(ent["summary"])
        n_inl = int(s[0])
        pos, quat = s[1:4], s[4:8]
        ts = ent["ts"]

        if n_inl < tr.min_track_matches:
            # Tracking failure right after initialization means the
            # two-view geometry was bad (monocular init is a lottery on
            # low-parallax scenes): discard the young map and re-
            # initialize, like ORB-SLAM's reset-if-few-keyframes.
            if self._n_kf_host <= 5:
                self.reset()
                return TrackOutput(self.state, None, None, 0, ts)
            # The frame starved even after the in-graph wide rescue:
            # rewind the pose chain to before this frame and drop the
            # speculatively dispatched newer in-flight entries.
            self._R, self._t = ent["R_prev"], ent["t_prev"]
            self._R2, self._t2 = self._R, self._t
            self._has_vel = jnp.asarray(False)
            self._pending.clear()
            self._lost_frames += 1
            # A couple of in-place retries, then full relocalization
            # (ORB-SLAM moves to reloc almost immediately on loss).
            self.state = (TRACKING_RECENTLY_LOST
                          if self._lost_frames <= 3 else TRACKING_LOST)
            out = TrackOutput(self.state, None, None, 0, ts)
            self._last_out = out
            return out

        self._last_inliers = n_inl
        self._lost_frames = 0
        self.state = TRACKING_OK
        self._frames_since_kf += 1

        self._maybe_close_loop()
        self._maybe_weld()
        if self._need_keyframe(n_inl):
            self._insert_keyframe(ent["frame"], ent["res"])

        self._trajectory.append((ts, pos, quat))
        out = TrackOutput(TRACKING_OK, pos, quat, n_inl, ts)
        self._last_out = out
        return out

    def _flush_pipeline(self) -> None:
        """Drain in-flight frames (state transitions, shutdown)."""
        while self._pending:
            if self.state not in (TRACKING_OK, TRACKING_RECENTLY_LOST):
                self._pending.clear()
                return
            self._process_lagged()

    def _relocalize(self, frame: Frame, timestamp: float) -> None:
        """Pose recovery against the map (Tracking::Relocalization):
        retrieval-guided re-track. On success, resume normal tracking
        from the recovered pose. After ``atlas_reloc_patience``
        consecutive failures on a mature map, the map is frozen into
        the atlas and a fresh one starts (ORB-SLAM3's Atlas: a long
        occlusion in new territory starts map #2 instead of killing
        the session; the weld happens on re-detection)."""
        self._key, sub = jax.random.split(self._key)
        res, score = self._reloc_step(self.map, frame, sub)
        if int(res.n_inliers) >= self.cfg.tracking.min_track_matches:
            self._R, self._t = res.R, res.t
            self._R2, self._t2 = res.R, res.t
            self._has_vel = jnp.asarray(False)
            self.state = TRACKING_OK
            self._last_inliers = int(res.n_inliers)
            self._lost_frames = 0
            self._reloc_failures = 0
            self._frames_since_kf += 1
            self._reloc_boundary_next_kf = True
            return
        self._reloc_failures += 1
        tr = self.cfg.tracking
        if (self._reloc_failures >= tr.atlas_reloc_patience
                and self._slots_used >= tr.atlas_min_kf):
            self._freeze_to_atlas()

    def _freeze_to_atlas(self) -> None:
        """Park the active map and start a fresh one; the session's
        trajectory history and the atlas survive the reset."""
        self.atlas.append(self.map)
        if len(self.atlas) > self.cfg.tracking.max_atlas_maps:
            self.atlas.pop(0)
        traj, kf_traj = self._trajectory, self._kf_trajectory
        key, atlas = self._key, self.atlas
        loops, welds = self.loops_closed, self.welds_done
        attempts = self.loop_attempts
        self.reset()
        self._trajectory, self._kf_trajectory = traj, kf_traj
        self._key, self.atlas = key, atlas
        self.loops_closed, self.welds_done = loops, welds
        self.loop_attempts = attempts

    def _maybe_close_loop(self) -> None:
        """Two-phase, never blocking the frame loop:
        phase 1 — candidate score fetched in the background; if it
        clears the bar, dispatch the Sim3 verification and background-
        fetch ITS verdict; phase 2 — on a verified loop, dispatch the
        pose-graph correction + whole-map BA (pure device work, no
        sync). The frame loop only ever inspects completed futures."""
        if self._pending_loop is None:
            return
        tr = self.cfg.tracking
        # pipeline_stretch == 1 is the fully-synchronous mode (CPU
        # tests): probe phases resolve immediately instead of when
        # their background fetch happens to land, so run-to-run
        # behavior does not depend on machine load.
        sync = tr.pipeline_stretch <= 1

        if len(self._pending_loop) == 4:       # phase 1: score
            kf_slot, cand_prev, score_fut, cand_fut = self._pending_loop
            if not (sync or (score_fut.done() and cand_fut.done())):
                return      # fetch still in flight; re-check next frame
            score = float(score_fut.result())
            cand_val = int(cand_fut.result())
            if score <= tr.loop_score_min:
                self._pending_loop = None
                self._loop_consistency = None
                self.loop_attempts.append(
                    (int(kf_slot), cand_val, score, None))
                return
            # Temporal consistency (KeyFrameDatabase's consistency
            # groups): the retrieval hit must point at the same map
            # REGION (within loop_consistency_radius slots) on
            # consecutive keyframe probes before a Sim3 verification is
            # spent — one aliased-texture hit cannot trigger a loop.
            prev = self._loop_consistency
            self._loop_consistency = cand_val
            if (tr.loop_consistency_kf > 1
                    and (prev is None
                         or abs(cand_val - prev)
                         > tr.loop_consistency_radius)):
                self._pending_loop = None
                self.loop_attempts.append(
                    (int(kf_slot), cand_val, score, None))
                return
            kf_prev = jnp.asarray(kf_slot, jnp.int32)
            self._key, sub = jax.random.split(self._key)
            loop = self._loop_sim3(self.map, kf_prev, cand_prev, sub)
            ok_fut = self._fetch_pool.submit(np.asarray, loop.ok)
            self._pending_loop = (
                kf_slot, cand_prev, cand_fut, score, loop, ok_fut)
            return

        # phase 2: Sim3 verdict
        kf_slot, cand_prev, cand_fut, score, loop, ok_fut = \
            self._pending_loop
        if not (sync or ok_fut.done()):
            return
        self._pending_loop = None
        verified = bool(ok_fut.result())
        if verified:
            kf_prev = jnp.asarray(kf_slot, jnp.int32)
            self.map = self._loop_apply(self.map, kf_prev, cand_prev, loop)
            self.map = self._global_ba_step(self.map)
            self.loops_closed += 1
        self.loop_attempts.append(
            (int(kf_slot), int(cand_fut.result()), score, verified))

    def _maybe_weld(self) -> None:
        """Evaluate a pending atlas-weld probe: if the new keyframe
        retrieval-hits a frozen map, verify a cross-map Sim(3) and weld
        the frozen map into the active one (LoopClosing::MergeLocal)."""
        if self._pending_weld is None:
            return
        tr = self.cfg.tracking
        sync = tr.pipeline_stretch <= 1

        if len(self._pending_weld) == 2:       # phase 1: scores
            kf_slot, cands = self._pending_weld
            if not (sync or all(fut.done() for _, fut in cands)):
                return      # fetches in flight; re-check next frame
            self._pending_weld = None
            scores = [float(fut.result()) for _, fut in cands]
            best_i = int(np.argmax(scores))
            if scores[best_i] <= tr.loop_score_min:
                return
            self._key, sub = jax.random.split(self._key)
            res = self._atlas_sim3(
                self.map, self.atlas[best_i],
                jnp.asarray(kf_slot, jnp.int32), cands[best_i][0], sub)
            ok_fut = self._fetch_pool.submit(np.asarray, res.ok)
            self._pending_weld = (best_i, res, ok_fut)
            return

        # phase 2: cross-map Sim3 verdict
        best_i, res, ok_fut = self._pending_weld
        if not (sync or ok_fut.done()):
            return
        self._pending_weld = None
        if not bool(ok_fut.result()) or best_i >= len(self.atlas):
            return
        frozen = self.atlas[best_i]
        self.map, n_kf_imp, n_lm_imp = self._atlas_weld(
            self.map, frozen, res.sim3.s, res.sim3.R, res.sim3.t)
        self.atlas.pop(best_i)
        self._slots_used = int(np.asarray(self.map.n_kf))
        self._n_kf_host = max(self._n_kf_host, self._slots_used)
        # Whole-map refinement welds the seams (RunGlobalBundle-
        # Adjustment after a merge).
        self.map = self._global_ba_step(self.map)
        self.welds_done += 1
        self._pending_loop = None   # slot-stale after import

    def _need_keyframe(self, n_inl: int) -> bool:
        cfg = self.cfg
        # _slots_used mirrors the device-side append cursor so this
        # check never reads a device scalar (a per-frame host sync).
        if self._slots_used >= cfg.map.max_keyframes - 1:
            # Table full: compact it — redundant-KF culling frees slots
            # continuously, so compaction reclaims them and the map
            # capacity bounds the ACTIVE window, not the session
            # length. One device fetch at compaction rate (rare).
            self.map, n_valid = self._compact_step(self.map)
            self._slots_used = int(np.asarray(n_valid))
            # Slot ids shifted: pending slot-addressed probes are stale.
            self._pending_loop = None
            self._pending_weld = None
            self._loop_consistency = None
            if self._slots_used >= cfg.map.max_keyframes - 1:
                # Organic 90%-redundancy culling freed nothing: evict
                # the most redundant unprotected keyframe instead.
                self.map, _nc = self._forced_cull_step(self.map)
                self.map, n_valid = self._compact_step(self.map)
                self._slots_used = int(np.asarray(n_valid))
                if self._slots_used >= cfg.map.max_keyframes - 1:
                    return False  # nothing cullable at all
        if self._frames_since_kf < cfg.tracking.kf_min_interval:
            return False
        weak = n_inl < cfg.tracking.kf_tracked_ratio * max(self._inliers_at_kf, 1)
        stale = self._frames_since_kf >= cfg.tracking.kf_max_interval
        return weak or stale

    def _insert_keyframe(self, frame: Frame, track_res) -> None:
        # The keyframe's pose is its own frame's tracked pose (the
        # speculative chain may already be a frame ahead).
        self.map, kf_id, n_new = self._insert_kf_step(
            self.map, track_res.R, track_res.t, frame,
            track_res.matches.idx, track_res.matches.valid & track_res.inlier,
            jnp.asarray(self._reloc_boundary_next_kf))
        self.map = self._local_ba_step(self.map)
        self._n_kf_host += 1
        self._slots_used += 1
        self._reloc_boundary_next_kf = False
        # Periodic wide-window BA (cheap at 1/8 keyframe rate): grinds
        # down accumulated drift and residual init error that the
        # marching local window cannot reach.
        if self._n_kf_host % 8 == 0:
            self.map = self._wide_ba_step(self.map)

        # Loop closing: dispatch the candidate retrieval now; its score
        # is read lazily a few frames later (_maybe_close_loop at frame
        # rate) once the device->host copy has completed. The keyframe
        # slot is mirrored host-side (_slots_used) so no device scalar
        # is ever fetched for bookkeeping.
        tr = self.cfg.tracking
        if self._slots_used - 1 >= tr.loop_min_gap_kf:
            cand, score = self._loop_candidate(self.map, kf_id)
            self._pending_loop = (
                self._slots_used - 1, cand,
                self._fetch_pool.submit(np.asarray, score),
                self._fetch_pool.submit(np.asarray, cand))

        # Atlas weld probe: score the new keyframe's signature against
        # every frozen map's keyframe database; evaluated lazily once
        # the background fetch lands.
        if self.atlas:
            sig = self.map.kf_signature[kf_id]
            cands = []
            for fz in self.atlas:
                c, sc = self._atlas_cand(fz, sig)
                cands.append((c, self._fetch_pool.submit(np.asarray, sc)))
            self._pending_weld = (self._slots_used - 1, cands)

        # Propagate the BA adjustment to the speculative pose chain as a
        # left delta: Δ = T_kf_ba ∘ T_kf_pre^-1 applied to every chain
        # pose — the chain may have advanced past the keyframe while it
        # was in flight, and the relative motion (velocity) must
        # survive the correction. All lazy device ops, no sync.
        R_pre, t_pre = track_res.R, track_res.t
        R_ba = self.map.kf_R[kf_id]
        t_ba = self.map.kf_t[kf_id]
        dR = R_ba @ R_pre.T
        dt = t_ba - dR @ t_pre
        self._R, self._t = dR @ self._R, dR @ self._t + dt
        self._R2, self._t2 = dR @ self._R2, dR @ self._t2 + dt
        self._frames_since_kf = 0
        self._inliers_at_kf = self._last_inliers
        pos, quat = self._twc()
        self._kf_trajectory.append(
            (float(np.asarray(frame.timestamp)), pos, quat))

    # ------------------------------------------------------------------

    def _twc(self) -> Tuple[np.ndarray, np.ndarray]:
        Rwc, twc = se3_inverse(self._R, self._t)
        q = quat_from_rotmat(Rwc)
        return np.asarray(twc), np.asarray(q)

    # ------------------------------------------------------------------
    # Shutdown artifacts (reference: stats + TUM trajectory, …cc:652-671)

    def keyframe_poses(self):
        """(timestamps, positions, quaternions) of all SURVIVING
        keyframes, read from the CURRENT map — pose-graph/BA
        corrections applied after insertion are reflected, and culled
        keyframes are omitted (like ORB-SLAM, whose saved keyframe
        trajectory is the corrected, culled one)."""
        if self._slots_used == 0:
            return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        valid = np.asarray(self.map.kf_valid)
        n = min(self._slots_used, self.map.max_keyframes)
        sel = np.nonzero(valid[:n])[0]
        if len(sel) == 0:
            return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        Rws, tws = se3_inverse(self.map.kf_R[sel], self.map.kf_t[sel])
        quats = quat_from_rotmat(Rws)
        return (np.asarray(self.map.kf_timestamp[sel]),
                np.asarray(tws), np.asarray(quats))

    def keyframe_trajectory_tum(self) -> str:
        """TUM-format keyframe trajectory (timestamp tx ty tz qx qy qz qw),
        like SaveKeyFrameTrajectoryTUM (…cc:670) — corrected poses."""
        ts, pos, quat = self.keyframe_poses()
        lines = []
        for i in range(len(ts)):
            p, q = pos[i], quat[i]
            lines.append(
                f"{ts[i]:.6f} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}")
        return "\n".join(lines) + "\n"

    def trajectory(self) -> List[Tuple[float, np.ndarray, np.ndarray]]:
        return list(self._trajectory)

    def save_map(self, path: Optional[str] = None) -> str:
        """Checkpoint the map (the ORBSLAM3_MAP_PATH promise the
        reference plumbs but never uses — SURVEY.md §5)."""
        from send_slam_tpu.io.map_io import save_map
        return save_map(self.map, path)

    def load_map(self, path: Optional[str] = None) -> None:
        """Resume from a checkpoint: tracking restarts by PnP
        relocalization against the loaded landmarks (multi-session
        mapping, BASELINE.json config 5)."""
        from send_slam_tpu.io.map_io import load_map
        self.map = load_map(path)
        self._n_kf_host = int(self.map.n_kf)
        self._slots_used = self._n_kf_host
        self.state = TRACKING_LOST
        self._ref_frame = None
        self._vel = None
        self._lost_frames = 0

    def shutdown(self) -> None:
        pass
