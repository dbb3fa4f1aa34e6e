"""The System facade: host-side orchestration of the jitted SLAM steps.

TPU-native re-design of ORB_SLAM3::System + Tracking's state machine
(slam_backends/orb_slam_3/CMakeLists.txt:48-49; constructed by the
reference adapter at orbslam3_mono_networked.cc:511 and driven via
TrackMonocular at …cc:594). Key architectural departures:

- No threads for tracking/mapping: the per-frame hot path is ONE fused
  jitted dispatch that tracks the frame, DECIDES device-side whether it
  becomes a keyframe (lax.cond — the reference's frame-synchronous
  NeedNewKeyFrame, …cc:594-599; round 2 made this decision on the host
  from a lagged summary fetch, and the fetch-RTT-dependent decision lag
  was a dominant source of run-to-run outcome variance), inserts +
  triangulates it in-graph when it does, and runs ONE amortized
  bundle-adjustment slice over the covisibility window. The BA slices
  are the TPU-native analog of ORB-SLAM3's LocalMapping thread
  overlapping Tracking: a single device cannot run two programs at
  once, so mapping work is time-sliced into the frame step instead of
  bursting 26-150 ms dispatches onto the frame dependency chain.
- Wide/global BA polish runs as a queue of single-iteration slices,
  one dispatched per frame — same total device work, no single-frame
  stall (the round-2 median-vs-mean gap of 16x was exactly these
  bursts).
- Data-dependent HOST decisions that remain (initialized? lost?
  loop verified? compaction?) happen at frame/keyframe rate from a
  12-float summary fetched one frame late; all math stays on device
  with static shapes.
- The map is a fixed-capacity pytree (models/map_state.py) living on
  device; the host never materializes it.

Public API mirrors the reference backend's usage:
``track_monocular(gray, timestamp) -> TrackOutput`` (pose +
tracking_state, the contents of the pose packet …cc:225-282),
``get_tracking_state()``, ``shutdown()``/``keyframe_trajectory()``
(SaveKeyFrameTrajectoryTUM, …cc:670).
"""

from __future__ import annotations

import collections
import dataclasses
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.config import EngineConfig
from send_slam_tpu.geometry.se3 import (
    quat_from_rotmat, se3_compose, se3_inverse, so3_exp, so3_log,
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

# Summary vector layout (the ONLY per-frame device->host traffic, read
# one frame late): [n_inliers, twc(3), quat(4), kf_inserted, n_kf,
# kf_slot, n_landmarks].
S_INLIERS, S_POS, S_QUAT, S_KF, S_NKF, S_SLOT, S_NLM = 0, 1, 4, 8, 9, 10, 11
SUMMARY_LEN = 12


class LoopState(NamedTuple):
    """Device-side per-frame tracking state, carried between frame
    dispatches (the host holds the pytree but never reads it): the
    speculative pose chain, the motion-model flag, and the keyframe /
    BA-slice counters that used to be host mirrors."""

    R: jnp.ndarray              # (3,3) current Tcw
    t: jnp.ndarray              # (3,)
    R2: jnp.ndarray             # one-older pose (motion model)
    t2: jnp.ndarray
    has_vel: jnp.ndarray        # () bool
    frames_since_kf: jnp.ndarray  # () int32
    inliers_at_kf: jnp.ndarray    # () int32
    ba_it: jnp.ndarray            # () int32 — BA slices since last KF
    ba_window: jnp.ndarray        # (W,) int32 — covis window of newest KF
    weak_run: jnp.ndarray         # () int32 — consecutive weak frames


class RelocOut(NamedTuple):
    """Result of the multi-candidate relocalization step."""

    R: jnp.ndarray
    t: jnp.ndarray
    n_inliers: jnp.ndarray


class TrackOutput(NamedTuple):
    """Host-side result of one frame: everything the pose packet needs."""

    tracking_state: int
    position: Optional[np.ndarray]      # Twc translation (3,)
    orientation: Optional[np.ndarray]   # Twc unit quaternion (x,y,z,w)
    n_inliers: int
    timestamp: float
    # Diagnostics riding the same lagged summary (no extra fetch):
    # live landmark count at dispatch time (-1 when unknown).
    n_landmarks: int = -1
    # Late-emitted poses of EARLIER frames: (timestamp, position,
    # orientation) triples. Two producers: init-commit trajectory
    # backfill (frames between the committed pair, tracked against the
    # fresh map) and the collapse-probe hold flush (poses withheld
    # while the young-map probe was pending). Consumers that only care
    # about the live pose can ignore it; trajectory consumers (bench,
    # TUM dump) should append these like regular poses.
    backfill: tuple = ()


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
        MK = config.map.max_keyframes
        W = config.map.ba_window

        self._make_frame = jax.jit(
            lambda img, ts: make_frame(img, ts, orb, cam))

        # Multi-reference init (round 5, the BENCH_r04 coverage fix):
        # ONE vmapped dispatch scores the current frame against
        # K = len(init_ref_gaps) cached references, and ONE host fetch
        # returns every pair's (ok, score, n_good, t_dir) — on the
        # remote axon backend each fetch is 30-2000 ms, so the round-2
        # one-bundle-per-attempt discipline is kept while the t-dir
        # consistency gate gets C(K,2) same-frame reproducibility
        # samples per frame instead of one (certification used to take
        # 30-54 frames on hard seeds; two BENCH_r04 seeds never
        # certified at all).
        self._n_init_refs = len(tr.init_ref_gaps)

        def _init_multi(refs: Frame, cur: Frame, keys, par_scale):
            def one(ref: Frame, key):
                res = two_view_init(
                    ref.uv_und, ref.feat.desc, ref.feat.valid,
                    ref.feat.angle,
                    cur.uv_und, cur.feat.desc, cur.feat.valid,
                    cur.feat.angle,
                    self._K, key, tr, par_scale=par_scale)
                # |t| is the pair's baseline in ITS median-depth=1
                # gauge: two pairs seeing the same scene agree on it
                # (per unit time) iff their reconstructions share a
                # consistent scale — the certification-time version of
                # the collapse probe's velocity test (see
                # _try_initialize).
                t_norm = jnp.maximum(jnp.linalg.norm(res.t), 1e-12)
                t_dir = res.t / t_norm
                probe = jnp.concatenate([
                    jnp.stack([res.ok.astype(jnp.float32), res.score,
                               res.n_good.astype(jnp.float32)]),
                    t_dir, t_norm[None]])
                return res, probe
            res, probes = jax.vmap(one)(refs, keys)
            return res, probes.reshape(-1)        # (K*7,) — one fetch
        self._init_multi = jax.jit(_init_multi)

        # Init-commit trajectory backfill (TrackingConfig.init_backfill):
        # the cached frames between the committed pair, tracked against
        # the fresh two-KF map in ONE vmapped dispatch. Pose priors are
        # the geodesic interpolation of the pair's relative pose at
        # each frame's time fraction; tracking's own two-pass
        # projection matching + GN does the rest. Output rides one
        # (B, 8) bundle — [twc(3), quat(4), n_inliers(1)] — so the
        # host pays ONE fetch for the whole batch.
        self._n_backfill = max(max(tr.init_ref_gaps) - 1, 1)

        def _backfill_step(m: MapState, R_cur, t_cur, alphas, frames):
            phi = so3_log(R_cur)

            def one(alpha, frame: Frame):
                R_pred = so3_exp(alpha * phi)
                t_pred = alpha * t_cur
                r = track_frame(
                    R_pred, t_pred,
                    m.lm_pos, m.lm_desc, m.lm_valid,
                    frame.uv_und, frame.feat.desc, frame.feat.valid,
                    frame.feat.octave,
                    cam.fx, cam.fy, cam.cx, cam.cy,
                    cam.width, cam.height,
                    tr, scale_factor=orb.scale_factor)
                Rwc, twc = se3_inverse(r.R, r.t)
                q = quat_from_rotmat(Rwc)
                return jnp.concatenate(
                    [twc, q, r.n_inliers.astype(jnp.float32)[None]])
            return jax.vmap(one)(alphas, frames)
        self._backfill_step = jax.jit(_backfill_step)
        self._update_stats = jax.jit(update_landmark_stats)

        from send_slam_tpu.models.covisibility import (
            compact_keyframes, covis_window_ids, cull_redundant_keyframes,
        )

        def _frame_step(m: MapState, st: LoopState, img, ts, chain_break):
            """The fused per-frame hot path, ONE dispatch with NO host
            inputs derived from device reads. Track -> device-side
            keyframe decision -> (cond) insert + triangulate -> (cond)
            one amortized BA slice -> rebase the speculative pose
            chain by the newest keyframe's BA delta. The host fetches
            only the 12-float summary, one frame late — keyframe
            placement and map refinement no longer depend on the
            fetch schedule (round-2's variance source)."""
            img_f = img.astype(jnp.float32)
            # Damped velocity prediction: T_vel = exp(a·log(T_prev ∘
            # T_prev2^-1)) — see TrackingConfig.velocity_damping.
            from send_slam_tpu.geometry.se3 import se3_exp, se3_log
            R2i, t2i = se3_inverse(st.R2, st.t2)
            Rv, tv = se3_compose(st.R, st.t, R2i, t2i)
            xi = se3_log(Rv, tv) * tr.velocity_damping
            Rv, tv = se3_exp(xi)
            Rp, tp = se3_compose(Rv, tv, st.R, st.t)
            R_pred = jnp.where(st.has_vel, Rp, st.R)
            t_pred = jnp.where(st.has_vel, tp, st.t)

            frame = make_frame(img_f, ts, orb, cam)
            res = track_frame(
                R_pred, t_pred,
                m.lm_pos, m.lm_desc, m.lm_valid,
                frame.uv_und, frame.feat.desc, frame.feat.valid,
                frame.feat.octave,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                tr, scale_factor=orb.scale_factor,
                search_radius=tr.search_radius_px,
                R_rescue=st.R, t_rescue=st.t,
                lm_normal=m.lm_normal, lm_dist_min=m.lm_dist_min,
                lm_dist_max=m.lm_dist_max, n_levels=orb.n_levels)
            m = update_landmark_stats(m, res.in_view, res.inlier)

            # --- keyframe decision, in-graph (NeedNewKeyFrame) -----------
            fs = st.frames_since_kf + 1
            ok = res.n_inliers >= tr.min_track_matches
            if tr.kf_ref_map:
                # Reference = the newest keyframe's live count of
                # MATURE map points (>= min(3, n_kf) keyframe
                # observations — ORB-SLAM3's nRefMatches). A map
                # property: culling lowers it, maturation raises it,
                # and a noisy per-frame inlier dip cannot re-anchor it
                # (the classic anchor ratchets — see config.kf_ref_map).
                ML_ = m.max_landmarks
                newest = jnp.clip(m.n_kf - 1, 0, MK - 1)
                obs_row = m.kf_obs_lm[newest]                    # (N,)
                mature_th = jnp.minimum(m.n_kf, 3)
                mature = m.lm_valid & (m.lm_vote_count >= mature_th)
                ref = jnp.sum(((obs_row >= 0)
                               & mature[jnp.clip(obs_row, 0, ML_ - 1)]
                               ).astype(jnp.int32))
            else:
                ref = st.inliers_at_kf
            weak_now = res.n_inliers < jnp.asarray(
                tr.kf_tracked_ratio, jnp.float32) \
                * jnp.maximum(ref, 1).astype(jnp.float32)
            # Weak-trigger hysteresis: a SINGLE under-ratio frame is
            # often backend/measurement noise, and one noise-placed KF
            # re-anchors inliers_at_kf low, cascading the whole KF
            # schedule into a different (usually worse) basin — the
            # round-3 TPU-vs-CPU divergence mechanism. Require the
            # weakness to persist kf_weak_frames consecutive frames.
            weak_run = jnp.where(weak_now, st.weak_run + 1,
                                 jnp.asarray(0, jnp.int32))
            weak = weak_run >= tr.kf_weak_frames
            stale = fs >= tr.kf_max_interval
            capacity = m.n_kf < MK - 1
            need_kf = ok & capacity & (fs >= tr.kf_min_interval) \
                & (weak | stale)
            kf_slot = jnp.where(need_kf, m.n_kf, -1)

            def do_insert(m):
                m2, kf_id, _n_new = insert_keyframe_with_triangulation(
                    m, res.R, res.t, frame, res.matches.idx,
                    res.matches.valid & res.inlier, self._K, tr,
                    chain_break=chain_break,
                    scale_factor=orb.scale_factor, n_levels=orb.n_levels,
                    triangulate_backs=tr.triangulate_backs)
                ids, _ = covis_window_ids(m2, W)
                return m2, ids

            def no_insert(m):
                return m, st.ba_window

            m, win = jax.lax.cond(need_kf, do_insert, no_insert, m)

            # --- amortized BA (LocalMapping time-slice) ------------------
            # The INSERT frame runs the first kf_insert_ba_iters GN
            # iterations immediately: freshly triangulated landmarks
            # must never be exposed to the next frame's tracking raw
            # (forward-marching scenes triangulate new points at low
            # parallax; one frame tracked against unrefined structure
            # measurably diverges the pose chain). Subsequent frames
            # each run ONE slice with the damping decayed from where
            # the insert burst left off.
            K_INS = tr.kf_insert_ba_iters
            ba_it = jnp.where(need_kf, K_INS, st.ba_it)
            run_ba = (~need_kf) & (m.n_kf >= 3) & (ba_it < tr.ba_slice_max)
            lam = jnp.maximum(
                tr.ba_slice_damping * (0.5 ** ba_it.astype(jnp.float32)),
                tr.ba_slice_damping * 1e-2)
            do_prune = ba_it >= tr.ba_prune_after

            def insert_burst(m):
                return local_bundle_adjustment(
                    m, self._K, config.map, iters=K_INS,
                    damping=tr.ba_slice_damping, window_ids=win,
                    prune=True)

            def do_slice(m):
                return jax.lax.cond(
                    run_ba,
                    lambda m: local_bundle_adjustment(
                        m, self._K, config.map, iters=1, damping=lam,
                        window_ids=win, prune=do_prune),
                    lambda m: m, m)

            m = jax.lax.cond(need_kf & (m.n_kf >= 3), insert_burst,
                             do_slice, m)
            ba_it = ba_it + run_ba.astype(jnp.int32)

            # NO explicit chain rebase for local BA deltas: the next
            # frame's pose GN re-anchors to the refined map within one
            # frame (the corrections are sub-pixel at the matcher's
            # window scale), whereas injecting the per-insert BA delta
            # into the motion model measurably DESTABILIZES tracking
            # (stall-and-jump chain dynamics -> biased triangulation
            # baselines -> divergence on forward-marching scenes; the
            # A/B is 136/140 frames tracked without vs 62/140 with).
            # Only LARGE discrete corrections (loop closure) rebase the
            # chain explicitly (_maybe_close_loop -> _rebase_st).
            R_out = res.R
            t_out = res.t
            st_new = LoopState(
                R=R_out, t=t_out,
                R2=st.R, t2=st.t,
                has_vel=jnp.asarray(True),
                frames_since_kf=jnp.where(need_kf, 0, fs),
                inliers_at_kf=jnp.where(need_kf, res.n_inliers,
                                        st.inliers_at_kf),
                ba_it=ba_it, ba_window=win,
                weak_run=jnp.where(need_kf, 0, weak_run))

            Rwc, twc = se3_inverse(R_out, t_out)
            quat = quat_from_rotmat(Rwc)
            summary = jnp.concatenate([
                res.n_inliers[None].astype(jnp.float32), twc, quat,
                need_kf[None].astype(jnp.float32),
                m.n_kf[None].astype(jnp.float32),
                kf_slot[None].astype(jnp.float32),
                m.n_landmarks()[None].astype(jnp.float32)])
            return m, st_new, summary
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

        def _reloc_step(m: MapState, frame: Frame, key):
            """Relocalization with ORB-SLAM3's candidate structure
            (Tracking::Relocalization, CMakeLists.txt:71): the TOP-K
            retrieval candidates each provide a pose prior tracked with
            a wide window (vmapped — one dispatch), and the prior-free
            6-pt DLT PnP RANSAC (models/relocalize.py) runs alongside
            for kidnapped-robot cases where retrieval priors are all
            wrong. Best recovery by inlier count wins. Round 2 used
            argmax-retrieval only and never invoked PnP at runtime
            (VERDICT r2 missing #6)."""
            from send_slam_tpu.models.relocalize import relocalize
            from send_slam_tpu.models.retrieval import (
                frame_signature, idf_weights, retrieval_scores,
            )
            sig = frame_signature(frame.feat.desc, frame.feat.valid)
            idf = idf_weights(m.kf_signature, m.kf_valid)
            scores = jnp.where(
                m.kf_valid, retrieval_scores(m.kf_signature, sig, idf=idf),
                -1.0)
            TOPK = 3
            _, top = jax.lax.top_k(scores, TOPK)

            def try_candidate(c):
                r = track_frame(
                    m.kf_R[c], m.kf_t[c],
                    m.lm_pos, m.lm_desc, m.lm_valid,
                    frame.uv_und, frame.feat.desc, frame.feat.valid,
                    frame.feat.octave,
                    cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                    tr, scale_factor=orb.scale_factor, search_radius=64.0,
                    enable_rescue=False)
                return r.R, r.t, r.n_inliers

            Rc, tc, nc = jax.vmap(try_candidate)(top)        # (K,3,3)...
            bi = jnp.argmax(nc)
            R_best, t_best, n_best = Rc[bi], tc[bi], nc[bi]

            pnp = relocalize(
                m.lm_pos, m.lm_desc, m.lm_valid,
                frame.uv_und, frame.feat.desc, frame.feat.valid,
                self._K, key, tr)
            use_pnp = pnp.ok & (pnp.n_inliers > n_best)
            R = jnp.where(use_pnp, pnp.R, R_best)
            t = jnp.where(use_pnp, pnp.t, t_best)
            n = jnp.where(use_pnp, pnp.n_inliers, n_best)
            return RelocOut(R=R, t=t, n_inliers=n), scores[top[0]]
        self._reloc_step = jax.jit(_reloc_step)

        def _maintain_step(m: MapState):
            # Keyframe-rate map maintenance (the tail of ORB-SLAM's
            # LocalMapping loop): zero-obs landmark pruning + redundant
            # keyframe culling. Dispatched by the host when the lagged
            # summary reports an insert — pure device work, no sync.
            m = prune_zero_obs_landmarks(m)
            m, _ncull = cull_redundant_keyframes(m, max_cull=2)
            return m
        self._maintain_step = jax.jit(_maintain_step)
        self._compact_step = jax.jit(compact_keyframes)
        self._covis_window = jax.jit(
            lambda m: covis_window_ids(m, W)[0])
        # Capacity-pressure cull: when the table fills and no keyframe
        # crossed the 90% redundancy bar organically, drop the single
        # MOST redundant unprotected keyframe so the session can
        # continue (the capacity bounds the active window, never the
        # session length).
        self._forced_cull_step = jax.jit(
            lambda m: cull_redundant_keyframes(
                m, redundancy_th=0.0, keep_latest=3, max_cull=1))

        def _newest_kf_delta(m_pre: MapState, m_post: MapState):
            cur = jnp.clip(m_pre.n_kf - 1, 0, MK - 1)
            Rb, tb = m_pre.kf_R[cur], m_pre.kf_t[cur]
            Ra, ta = m_post.kf_R[cur], m_post.kf_t[cur]
            dR = Ra @ Rb.T
            dt = ta - dR @ tb
            return dR, dt

        def _polish_slice(m: MapState, lam, prune, wcfg, window_ids=None,
                          n_fixed=2, renorm_baseline=False):
            """One wide/global BA iteration + the newest-KF delta and a
            device-side LARGE-DELTA flag. Small polish deltas are
            gauge-settling noise the next frame's pose GN absorbs;
            rebasing the chain by them destabilizes tracking (CLAUDE.md
            round-3 A/B). But an old-anchored wide/global window
            settling accumulated drift can move the newest keyframe
            further than the matcher's search window in ONE slice — the
            speculative chain then predicts into empty space and
            tracking falls off a cliff (round-3 TPU bench: 116 -> 16
            inliers frame-to-frame). Large discrete corrections rebase,
            like loop closures do; the threshold is measured against
            the last inter-keyframe baseline (scale-free)."""
            m2 = local_bundle_adjustment(
                m, self._K, wcfg, iters=1, damping=lam, prune=prune,
                window_ids=window_ids, n_fixed=n_fixed)
            if renorm_baseline:
                # One-anchor solves leave the monocular scale direction
                # null: on an already-straight map the Huber reweighting
                # lets the cost drift along it (measured: healthy seed
                # 42 bent 0.048 -> 0.28 by the unpinned young burst).
                # Restore the KF0->KF1 baseline length about KF0's
                # center after every slice — shape corrections survive,
                # gauge drift cannot.
                def center(mm, i):
                    return -(mm.kf_R[i].T @ mm.kf_t[i][:, None])[:, 0]
                C0 = center(m2, 0)
                b_pre = jnp.linalg.norm(center(m, 1) - center(m, 0))
                b_post = jnp.maximum(
                    jnp.linalg.norm(center(m2, 1) - C0), 1e-9)
                s = b_pre / b_post
                C_all = -jnp.einsum('kij,kj->ki', m2.kf_R.transpose(0, 2, 1),
                                    m2.kf_t)
                C_new = C0 + s * (C_all - C0)
                kf_t_new = -jnp.einsum('kij,kj->ki', m2.kf_R, C_new)
                m2 = m2._replace(
                    kf_t=jnp.where(m2.kf_valid[:, None], kf_t_new, m2.kf_t),
                    lm_pos=jnp.where(m2.lm_valid[:, None],
                                     C0 + s * (m2.lm_pos - C0), m2.lm_pos),
                    lm_dist_min=m2.lm_dist_min * s,
                    lm_dist_max=m2.lm_dist_max * s)
            dR, dt = _newest_kf_delta(m, m2)
            cur = jnp.clip(m.n_kf - 1, 0, MK - 1)
            prev = jnp.clip(m.n_kf - 2, 0, MK - 1)
            Cb = -(m.kf_R[cur].T @ m.kf_t[cur][:, None])[:, 0]
            Ca = -(m2.kf_R[cur].T @ m2.kf_t[cur][:, None])[:, 0]
            Cp = -(m.kf_R[prev].T @ m.kf_t[prev][:, None])[:, 0]
            base = jnp.maximum(jnp.linalg.norm(Cb - Cp), 1e-6)
            ang = jnp.arccos(jnp.clip((jnp.trace(dR) - 1.0) / 2.0,
                                      -1.0, 1.0))
            big = (ang > np.deg2rad(tr.polish_rebase_min_deg)) \
                | (jnp.linalg.norm(Ca - Cb)
                   > tr.polish_rebase_baseline_frac * base)
            return m2, dR, dt, big

        from send_slam_tpu.models.covisibility import wide_window_ids
        wide_W = min(MK, 64)
        wide_cfg = dataclasses.replace(config.map, ba_window=wide_W)
        glob_cfg = dataclasses.replace(config.map, ba_window=MK)

        def _wide(m, lam, prune):
            # Window choice per config (see wide_ba_covis_window).
            if tr.wide_ba_covis_window:
                ids, _ = wide_window_ids(m, wide_W)
            else:
                ids = None
            return _polish_slice(m, lam, prune, wide_cfg, window_ids=ids)

        self._wide_slice = jax.jit(_wide)
        self._global_slice = jax.jit(
            lambda m, lam, prune: _polish_slice(m, lam, prune, glob_cfg))
        # Young-map re-solve (round 5): a ONE-anchor recency-window BA
        # slice, run as a one-shot burst once the session holds a few
        # keyframes. The two-view init's relative pose is frozen by the
        # standard >=2-anchor policy (both init keyframes are the
        # window's oldest slots, so a slightly-bent low-parallax init —
        # t-dir off by a few degrees, certified and probe-passing —
        # pins a bent gauge the rest of the session builds on; the
        # round-5 TPU tail seeds 11/88 show exactly this: KF-warp with
        # stream/kf alignment-scale parity). With ONE anchor the
        # accumulated multi-view observations re-solve KF1..n and the
        # structure; the transient scale freedom is harmless (one
        # burst, and the mono gauge re-pins at the next 2-anchor BA).
        self._young_slice = jax.jit(
            lambda m, lam, prune: _polish_slice(m, lam, prune, wide_cfg,
                                                n_fixed=1,
                                                renorm_baseline=True))

        def _rebase_st(st: LoopState, dR, dt):
            return st._replace(
                R=dR @ st.R, t=dR @ st.t + dt,
                R2=dR @ st.R2, t2=dR @ st.t2 + dt)
        self._rebase_st = jax.jit(_rebase_st)

        def _rebase_st_cond(st: LoopState, dR, dt, big):
            st2 = _rebase_st(st, dR, dt)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(big, a, b), st2, st)
        self._rebase_st_cond = jax.jit(_rebase_st_cond)

        from send_slam_tpu.models.loop_closing import (
            apply_loop_correction, compute_loop_sim3_multi, loop_candidates,
            map_reprojection_median,
        )
        self._loop_candidate = jax.jit(
            lambda m, kf_id: loop_candidates(m, kf_id, tr.loop_min_gap_kf,
                                             k=3))
        self._loop_sim3 = jax.jit(
            lambda m, kf, cands, key: compute_loop_sim3_multi(
                m, kf, cands, key, tr, min_matches=tr.loop_min_matches))

        cam = self.cfg.camera

        def _loop_apply_fn(m, kf, cand, loop):
            med_before = map_reprojection_median(
                m, cam.fx, cam.fy, cam.cx, cam.cy)
            m2 = apply_loop_correction(
                m, kf, cand, loop, covis_max_gap=tr.loop_covis_max_gap)
            med_after = map_reprojection_median(
                m2, cam.fx, cam.fy, cam.cx, cam.cy)
            dR, dt = _newest_kf_delta(m, m2)
            return m2, dR, dt, med_before, med_after
        self._loop_apply = jax.jit(_loop_apply_fn)
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

        # Survives reset(): the collapse detector must not loop forever
        # on a world whose inits keep committing badly.
        self._collapse_resets = 0
        # Session-cumulative observability (survives reset(), unlike
        # the per-map mirrors): a long session that resets mid-run must
        # still report how much mapping work it actually did — the
        # reference's shutdown stats aggregate the whole process
        # lifetime (orbslam3_mono_networked.cc:656-671), not the last
        # map. Bench long-mode reads these.
        self.session_kf_inserted = 0
        self.session_resets = -1      # reset() in __init__ brings it to 0
        self.session_loops_applied = 0

        # Warmup tail readiness (see warmup()): set = every program is
        # compiled (or warmup was never called — lazy compiles, the
        # old behavior). The host checks it before dispatching the
        # rarely-hit programs so a still-compiling tail cannot stall
        # the frame loop.
        import threading
        self._tail_ready = threading.Event()
        self._tail_ready.set()
        self.warmup_tail_s = -1.0   # wall time to tail-ready (warmup())

        self.reset()

    # ------------------------------------------------------------------

    def _fresh_loop_state(self) -> LoopState:
        cfg = self.cfg
        eye = jnp.eye(3, dtype=jnp.float32)
        zero = jnp.zeros(3, jnp.float32)
        return LoopState(
            R=eye, t=zero, R2=eye, t2=zero,
            has_vel=jnp.asarray(False),
            frames_since_kf=jnp.asarray(0, jnp.int32),
            inliers_at_kf=jnp.asarray(0, jnp.int32),
            # No BA slices until the first covis window exists.
            ba_it=jnp.asarray(cfg.tracking.ba_slice_max, jnp.int32),
            ba_window=jnp.full((cfg.map.ba_window,),
                               cfg.map.max_keyframes, jnp.int32),
            weak_run=jnp.asarray(0, jnp.int32))

    def warmup(self, image_dtype=np.uint8, block: bool = False) -> None:
        """Compile every jitted program the runtime can hit — one dummy
        call each — so no XLA compilation lands mid-sequence.

        Returns once the CRITICAL set (frame loop + init/bootstrap +
        per-KF maintenance) is compiled; the rarely-hit tail (polish,
        loop closing, relocalization) continues on a background daemon
        thread and the host gates those dispatches on readiness.
        ``block=True`` (or SLAM_WARMUP_BLOCK=1) waits for everything,
        like the pre-round-4 behavior.

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
        verbose = os.environ.get("SLAM_WARMUP_VERBOSE") == "1"
        block = block or verbose   # sequential timings need ordering
        self._tail_ready.clear()
        _t_start = time.perf_counter()
        self.warmup_tail_s = -1.0   # set when the tail finishes
        _t = [_t_start]

        def tick(name, out):
            """Per-program compile timing (SLAM_WARMUP_VERBOSE=1).
            block_until_ready is unreliable on the axon relay, but the
            COMPILE phase happens synchronously inside the traced call,
            which dominates these numbers on a cold cache."""
            if verbose:
                try:
                    jax.block_until_ready(out)
                except Exception:
                    pass
                now = time.perf_counter()
                print(f"# warmup {name:22s} {now - _t[0]:7.1f} s",
                      file=sys.stderr, flush=True)
                _t[0] = now
            return out

        img_f = jnp.asarray(
            rng.uniform(0, 255, (cam.height, cam.width)), jnp.float32)
        img_raw = jnp.asarray(
            rng.integers(0, 255, (cam.height, cam.width)).astype(image_dtype))
        frame = tick("make_frame", self._make_frame(img_f, 0.0))
        K_REF = self._n_init_refs
        refs = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * K_REF), frame)
        keys = jax.random.split(key, K_REF)
        res_m, _probe = tick("init_step",
                             self._init_multi(refs, frame, keys,
                                              jnp.asarray(1.0, jnp.float32)))
        init_res = jax.tree_util.tree_map(lambda x: x[0], res_m)
        m = tick("bootstrap_map",
                 self._bootstrap_map(self.map, frame, frame, init_res))
        B_BF = self._n_backfill
        bf_frames = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * B_BF), frame)
        _bf = tick("backfill_step",
                   self._backfill_step(m, init_res.R, init_res.t,
                                       jnp.zeros((B_BF,), jnp.float32),
                                       bf_frames))

        # CRITICAL SET vs TAIL (VERDICT r3 next-round #3, measured cold
        # on the axon TPU): the frame loop only needs make_frame /
        # init_step / bootstrap_map / frame_step / maintain_step
        # (~212 s of the 351 s serial total). The remaining programs
        # (wide/global polish, cull/compact, loop closing, reloc —
        # ~140 s) are not touched until tens of frames in, so they
        # compile on a BACKGROUND daemon thread while tracking runs;
        # the host gates their dispatch on tail_ready() so a slow tail
        # can never stall the frame loop mid-compile. (A fully
        # parallel 6-thread warmup was MEASURED SLOWER than serial on
        # the remote backend — 662 s vs 351 s cold — GIL-bound tracing
        # plus compile-service queuing; so both phases run serially.)
        st = self._fresh_loop_state()
        m2, st2, summary = tick("frame_step", self._frame_step(
            m, st, img_raw, 1.0, jnp.asarray(False)))
        m3 = tick("maintain_step", self._maintain_step(m2))

        def warm_tail():
            # try/finally: _tail_ready MUST always end up set. A relay
            # blip killing this daemon thread before set() would
            # silently disable wide-BA polish, loop closing AND
            # relocalization for the whole session (their dispatch
            # gates check the event) — the failed programs then simply
            # compile lazily on first dispatch, the pre-round-4
            # behavior (ADVICE r4, medium).
            try:
                lam = jnp.asarray(1e-3, jnp.float32)
                pr = jnp.asarray(False)
                kf_id = jnp.asarray(1, jnp.int32)
                m3w, dR, dt, big = tick("wide_slice",
                                        self._wide_slice(m, lam, pr))
                _m3y, _dRy, _dty, _bigy = tick(
                    "young_slice", self._young_slice(m, lam, pr))
                _st3 = tick("rebase_st_cond",
                            self._rebase_st_cond(st, dR, dt, big))
                m3g, _dR, _dt, _big = tick("global_slice",
                                           self._global_slice(m, lam, pr))
                _mf, _nc = tick("forced_cull", self._forced_cull_step(m))
                _mc, _nv = tick("compact", self._compact_step(m))
                _ids = tick("covis_window", self._covis_window(m))
                cands, scores = tick("loop_candidate",
                                     self._loop_candidate(m, kf_id))
                loop, cand_sel = tick("loop_sim3",
                                      self._loop_sim3(m, kf_id, cands, key))
                m4, _dRl, _dtl, _mb, _ma = tick(
                    "loop_apply", self._loop_apply(m, kf_id, cand_sel, loop))
                res_r, _sc = tick("reloc_step",
                                  self._reloc_step(m, frame, key))
                # Atlas programs: freeze/weld on prolonged reloc failure
                # compiles these mid-run otherwise (the flagship long
                # bench measured multi-second stalls exactly there).
                _c, _s = tick("atlas_cand",
                              self._atlas_cand(m, m.kf_signature[0]))
                aw = tick("atlas_sim3",
                          self._atlas_sim3(m, m, jnp.asarray(0, jnp.int32),
                                           jnp.asarray(0, jnp.int32), key))
                m5, _nk, _nl = tick(
                    "atlas_weld",
                    self._atlas_weld(m, m, aw.sim3.s, aw.sim3.R, aw.sim3.t))
                try:
                    jax.block_until_ready((m4, m3g, _ids, res_r, m5))
                except Exception:
                    pass
                # block_until_ready is a no-op on the axon relay (the
                # one trustworthy sync is a real host fetch): drain the
                # ~11 tail executions with one scalar fetch of the LAST
                # dispatch, or they drain into the first real frames —
                # measured as ~800 ms/frame for the first ~15 frames
                # and an 11-14 s time-to-first-track (VERDICT r4 #2).
                np.asarray(m5.n_kf)
            except Exception as e:  # noqa: BLE001 — backend transport
                print(f"# warmup tail failed ({e!r}); affected programs "
                      "will compile lazily on first dispatch",
                      file=sys.stderr, flush=True)
            finally:
                self.warmup_tail_s = time.perf_counter() - _t_start
                self._tail_ready.set()

        if block or os.environ.get("SLAM_WARMUP_BLOCK") == "1":
            warm_tail()
        else:
            import threading
            threading.Thread(target=warm_tail, daemon=True,
                             name="slam-warm-tail").start()
        try:
            jax.block_until_ready(summary)
        except Exception:
            pass
        # Drain one host fetch of the summary so the first real fetch
        # path (transfer plumbing, not just compile) is warm too.
        np.asarray(summary)

    # ------------------------------------------------------------------
    # State machine

    def reset(self) -> None:
        cfg = self.cfg
        self.session_resets += 1
        # PRNG chain restarts with the session: without this, a run's
        # RANSAC/retrieval draws depend on how many keys every PRIOR
        # session consumed, so a sweep-position run could not be
        # reproduced in isolation (round-5 forensics: sweep seed 17
        # scored 0.296 after seed 11's session while the identical
        # fresh run scored 0.0023 — different basin, pure key drift).
        # Every run is now exactly replayable as a fresh System.
        self._key = jax.random.PRNGKey(0)
        self.map: MapState = empty_map(cfg.map, cfg.orb.n_features)
        self.state = TRACKING_NO_IMAGES_YET
        # Session epoch: device timestamps are (t - _t0) so float32
        # arrays keep millisecond resolution under epoch-sized stamps.
        self._t0: Optional[float] = None
        self._st = self._fresh_loop_state()
        self._lost_frames = 0
        self._last_inliers = 0
        self._n_kf_host = 0        # keyframes ever inserted (monotonic)
        self._slots_used = 0       # host mirror of device n_kf (lagged)
        self._pending_loop = None
        # Optimistically-committed closure awaiting its sanity verdict
        # (_resolve_loop_sanity). Dropped on reset: the map it judges
        # is discarded with the session.
        self._pending_loop_sanity = None
        self._loop_consistency = None   # (last candidate slot, run length)
        self.loop_attempts: List[tuple] = []
        # Applied-closure cooldown anchor (TrackingConfig.loop_cooldown_kf).
        self._last_loop_nkf = -(10 ** 9)
        # Next keyframe's incoming chain edge crosses a relocalization
        # (the relative pose there is a jump, not motion) — recorded on
        # the keyframe itself (MapState.kf_chain_break).
        self._reloc_boundary_next_kf = False
        # Wide/global polish queue: (kind, lam, prune) slices, one
        # dispatched per frame.
        self._polish_queue: List[tuple] = []
        # One-shot young-map one-anchor re-solve (see _young_slice).
        self._young_polish_done = False
        # Set by _collapse_retry AFTER its internal reset: a failed
        # collapse probe marks the session init-hostile, arming the
        # young re-solve for the commit that eventually sticks.
        self._had_collapse_reset = False
        self._compact_cooldown = 0
        self._committed_ref = None  # last committed init's ref Frame
        # Multi-reference init state (see _try_initialize): rolling
        # cache of recent init-phase Frames (device pytrees, tiny —
        # descriptors + keypoints only), deep enough for the largest
        # configured reference gap.
        self._init_frames: collections.deque = collections.deque(
            maxlen=max(cfg.tracking.init_ref_gaps) + 1)
        # Best acceptable candidate seen so far (liveness-cap commit):
        # (score, res, ref_frame, cur_frame, ts, n_good).
        self._init_best = None
        # Previous frame's acceptable candidates for the cross-frame
        # t-dir comparison: (ts, attempt_idx, [unit t_dirs]).
        self._init_prev_cands = None
        # Consecutive frames whose acceptable candidates were ALL
        # vetoed by the t-dir gate (liveness cap — see _try_initialize).
        self._init_tdir_rejects = 0
        # Pipelined tracking: in-flight frames awaiting their (lagged)
        # summary fetch. Each entry: dict(ts, st_prev, future) —
        # st_prev is the pre-frame LoopState used to rewind when the
        # frame turns out lost.
        self._pending: List[dict] = []
        self._ready: List[TrackOutput] = []
        self._last_out: Optional[TrackOutput] = None
        self._trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self._kf_trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self._reloc_failures = 0
        self._pending_weld = None
        # Bench/debug observability (VERDICT r2 item 9): init cost.
        self.init_attempts = 0
        self.init_commit_ts: Optional[float] = None
        # Young-map scale-collapse detector (TrackingConfig
        # init_collapse_*): init-pair baseline velocity + the streamed
        # positions since commit.
        self._init_v: Optional[float] = None
        self._collapse_trace: List[tuple] = []
        self._collapse_active = False
        # Poses produced while the collapse probe is pending: flushed
        # into _trajectory on pass, discarded with the map on fail.
        self._held_outputs: List[tuple] = []
        # Late poses awaiting attachment to the next OK output's
        # backfill field (init backfill + probe-hold flushes).
        self._backfill_pending: List[tuple] = []
        # Rolling raw-frame cache (host references, zero copies): a
        # failed collapse probe re-attempts init IMMEDIATELY across
        # these instead of waiting for new frames (see _process_lagged).
        self._recent_imgs: collections.deque = collections.deque(maxlen=10)

    def get_tracking_state(self) -> int:
        return self.state

    def _collapse_retry(self, ts_rel: float) -> None:
        """Scale-collapse probe failed: discard the young map, seed
        the init frame cache from the rolling raw-image cache, and
        immediately re-attempt initialization at the boosted parallax
        floor (one _try_initialize pass over the seeded cache).

        A plain reset re-draws from the same starved ~1-frame-gap
        parallax distribution that produced the collapse (measured:
        3 probe-fail cycles burned 64/90 frames on bench seed 11),
        and re-arming against the ORIGINAL reference fails the other
        way — by the probe's verdict the scene has rotated enough
        that descriptor matching across the full gap collapses
        (n_good 159 at gap 7 vs 21 at gap 21 on the same arc). The
        image cache holds the intermediate gaps (7-13 frames): enough
        parallax to clear the boosted floor, recent enough to match.
        The session epoch is preserved so cached device timestamps
        stay valid. Unlike the round-4 retry (best acceptable pair,
        no gate), the re-attempt goes through the SAME multi-ref
        certification as a normal init — a rotten retry commit
        false-passed the collapse probe once already (the dt bug) and
        the gate is cheap now."""
        imgs = list(self._recent_imgs)
        t0 = self._t0
        self.reset()
        self._t0 = t0
        # Sticky init-hostility marker (survives THIS reset, cleared by
        # the next external one): this world has already drawn at least
        # one rotten reconstruction, so the eventual certified commit is
        # a member of the bent-risk class that earns the young-map
        # one-anchor re-solve (see _young_slice; clean-first-commit
        # worlds skip it — the solve measurably bends healthy maps,
        # seed-42 A/B 0.048 -> 0.27).
        self._had_collapse_reset = True
        if len(imgs) < 2:
            return
        for tsd, g in imgs[:-1]:
            self._init_frames.append(
                (float(tsd),
                 self._make_frame(jnp.asarray(g, jnp.float32), tsd)))
        ts_cur, img_cur = imgs[-1]
        cur = self._make_frame(jnp.asarray(img_cur, jnp.float32), ts_cur)
        self._try_initialize(cur, float(ts_cur))

    def _init_par_scale(self) -> float:
        """Median-parallax floor multiplier for init acceptance after
        repeated collapse resets. Flat for the first two retries (the
        certified retry is the fast path; boosting from reset 1
        starved it — seed-93 A/B in config.py), one boost step from
        the third (3+ consecutive probe failures = the scene's current
        parallax regime itself draws rotten reconstructions, TPU
        seed-29 forensics). Applied ONCE, never compounded:
        descriptor matching decays with the gap faster than parallax
        grows (n_good 159 at gap 7 / 1 deg vs 21 at gap 14 / 2 deg),
        so a second step (1.8 deg) put the floor past every matchable
        pair and deadlocked init for the rest of the session (0/90).
        Cleared when a probe passes."""
        boost = self.cfg.tracking.init_collapse_par_boost
        return float(boost) ** min(max(self._collapse_resets - 2, 0), 1)

    # ------------------------------------------------------------------

    def track_monocular(self, gray: np.ndarray, timestamp: float) -> TrackOutput:
        """gray: (H, W) uint8/float — one frame. Returns the pose in
        world-from-camera convention (Twc), like the reference backend
        sends (Twc = Tcw^-1, orbslam3_mono_networked.cc:246-249).

        ``timestamp`` may be an absolute epoch (real cameras stamp
        time.time(); TUM sequences carry ~1.3e9 s). Device arrays are
        float32 — at epoch magnitude one ULP is ~128 s, which silently
        destroys every timestamp comparison (the dataset e2e test
        caught init never committing because the reference-frame
        staleness check fired on rounding noise alone). All DEVICE
        timestamps are therefore session-relative (t - t0 of the first
        frame); host bookkeeping and outputs stay absolute."""
        if self._t0 is None:
            self._t0 = float(timestamp)
        ts_dev = float(timestamp) - self._t0
        self._recent_imgs.append((ts_dev, gray))
        if self.state in (TRACKING_OK, TRACKING_RECENTLY_LOST):
            return self._track_pipelined(gray, timestamp, ts_dev)

        self._flush_pipeline()
        img = jnp.asarray(gray, jnp.float32)
        if self.state in (TRACKING_NO_IMAGES_YET, TRACKING_NOT_INITIALIZED):
            frame = self._make_frame(img, ts_dev)
            self._try_initialize(frame, ts_dev)
        elif self.state == TRACKING_LOST:
            # Reloc rides the warmup TAIL: dispatching it while the
            # tail is still compiling would block the frame loop on a
            # ~36 s compile — the exact mid-run stall the readiness
            # gate exists to prevent (ADVICE r4). Stay LOST until the
            # program is compiled.
            if self._tail_ready.is_set():
                frame = self._make_frame(img, ts_dev)
                self._relocalize(frame, timestamp)

        if self.state == TRACKING_OK:
            pos, quat = self._twc()
            if self._collapse_active:
                # Fresh commit under a pending collapse probe: hold
                # (see _process_lagged) — the consumer keeps seeing
                # "initializing" until the probe passes.
                self._held_outputs.append((timestamp, pos, quat))
                out = TrackOutput(TRACKING_NOT_INITIALIZED, None, None,
                                  self._last_inliers, timestamp)
                self._last_out = out
                return out
            self._trajectory.append((timestamp, pos, quat))
            bf = tuple(self._backfill_pending)
            self._backfill_pending = []
            out = TrackOutput(TRACKING_OK, pos, quat,
                              self._last_inliers, timestamp, backfill=bf)
            self._last_out = out
            return out
        return TrackOutput(self.state, None, None, 0, timestamp)

    # ------------------------------------------------------------------

    def _commit_init(self, ref_frame, cur_frame, res, timestamp,
                     n_good=None) -> None:
        # Kept for the collapse detector: a failed scale probe re-arms
        # init against THIS frame (see _process_lagged) so the retry
        # pairs it with a much later frame instead of re-drawing from
        # the same starved-parallax gap distribution.
        self._committed_ref = ref_frame
        self.map = self._bootstrap_map(self.map, ref_frame, cur_frame, res)
        self._st = self._fresh_loop_state()._replace(
            R=res.R, t=res.t, R2=res.R, t2=res.t,
            inliers_at_kf=res.n_good.astype(jnp.int32))
        self.state = TRACKING_OK
        self._n_kf_host = 2
        self._slots_used = 2
        self.session_kf_inserted += 2
        # n_good arrives with the probe bundle (one fetch); falling
        # back to a device read only off the hot path.
        self._last_inliers = (int(n_good) if n_good is not None
                              else int(res.n_good))
        self._init_best = None
        self._init_prev_cands = None
        self._init_tdir_rejects = 0
        cached = list(self._init_frames)   # for backfill, below
        self._init_frames.clear()
        self.init_commit_ts = timestamp    # session-relative ("seq time")
        t0 = self._t0 or 0.0
        ts_ref = t0 + float(np.asarray(ref_frame.timestamp))
        eye_p, eye_q = np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0])
        self._kf_trajectory.append((ts_ref, eye_p, eye_q))
        ts_cur = t0 + float(np.asarray(cur_frame.timestamp))
        Rwc, twc = se3_inverse(res.R, res.t)
        twc_np = np.asarray(twc)
        self._kf_trajectory.append(
            (ts_cur, twc_np, np.asarray(quat_from_rotmat(Rwc))))
        # Arm the young-map scale-collapse detector: the init pair's
        # baseline velocity in map units/s is the yardstick the
        # streamed velocity is checked against while the map is young.
        tr = self.cfg.tracking
        # The PAIR's own timestamps, never host ref bookkeeping: the
        # round-4 retry path once used a host mirror that reset()
        # zeroed, silently stretching dt 3x — the inflated init_v let
        # a rotten retry commit false-pass the collapse probe.
        dt_init = max(ts_cur - ts_ref, 1.0 / 120.0)
        self._init_v = float(np.linalg.norm(twc_np)) / dt_init
        self._collapse_trace = []
        self._collapse_active = (
            tr.init_collapse_frac > 0.0
            and self._collapse_resets < tr.init_collapse_max_resets)

        # Trajectory backfill (TrackingConfig.init_backfill): track the
        # cached frames strictly between the committed pair against the
        # fresh map and emit their poses late. One vmapped dispatch,
        # one (B, 8) fetch. The poses ride the collapse-probe hold
        # exactly like the commit frame's own pose: flushed into the
        # output stream on probe pass, discarded with a dead map.
        ts_ref_rel = ts_ref - t0
        ts_cur_rel = ts_cur - t0
        between = [(tf, f) for tf, f in cached
                   if ts_ref_rel < tf < ts_cur_rel]
        if tr.init_backfill and between:
            B = self._n_backfill
            between = between[-B:]
            span = max(ts_cur_rel - ts_ref_rel, 1e-6)
            alphas = np.zeros((B,), np.float32)
            alphas[:len(between)] = [
                (tf - ts_ref_rel) / span for tf, _ in between]
            frames = [f for _, f in between]
            frames += [frames[-1]] * (B - len(frames))   # pad: static B
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *frames)
            bundle = np.asarray(self._backfill_step(
                self.map, res.R, res.t, jnp.asarray(alphas), stacked))
            sink = (self._held_outputs if self._collapse_active
                    else self._backfill_pending)
            for k, (tf, _f) in enumerate(between):
                if bundle[k, 7] >= tr.min_track_matches:
                    sink.append((t0 + tf, bundle[k, 0:3].copy(),
                                 bundle[k, 3:7].copy()))
            if not self._collapse_active:
                for item in self._backfill_pending:
                    self._trajectory.append(item)

    def _try_initialize(self, frame: Frame, timestamp: float) -> None:
        """Multi-reference batched two-view init (round 5).

        Every init frame is scored against K = len(init_ref_gaps)
        references from the rolling frame cache in ONE vmapped
        dispatch + ONE host fetch, and the t-dir consistency gate
        certifies from SAME-FRAME cross-reference agreement: two
        acceptable pairs (different cached references) agreeing in
        translation direction prove the direction is data-determined,
        so the best-scoring certified candidate commits immediately.
        Cross-frame agreement with the previous frame's acceptable
        candidates is kept as a second path (one pair may verify per
        frame on marginal scenes).

        This replaces the single-ref + probation + ref-slide scheme:
        with one pair per frame the gate got one reproducibility
        sample per frame and hard seeds burned 30-90 frames refusing
        to certify (BENCH_r04: tracked_median 40/90, two seeds 0/90).
        The gap ladder also dissolves the dead-ref problem — support
        decays as the baseline grows (n_good 159 at gap 7, 21 at gap
        21 on the bench arc), and the cache always holds short AND
        long gaps, so no host-side staleness heuristics remain."""
        tr = self.cfg.tracking
        cache = self._init_frames
        cache.append((timestamp, frame))
        self.state = TRACKING_NOT_INITIALIZED
        n = len(cache) - 1          # frames available as references
        if n < 1:
            return

        # Reference selection: cache[-1] is this frame; gap g -> the
        # frame g steps behind it (clamped to the oldest cached).
        # Duplicates after clamping are padded to keep the dispatch
        # shape static, and ignored host-side.
        idxs: List[int] = []
        for g in tr.init_ref_gaps:
            j = max(n - g, 0)
            if j not in idxs:
                idxs.append(j)
        n_uniq = len(idxs)
        while len(idxs) < self._n_init_refs:
            idxs.append(idxs[0])
        refs = [cache[j] for j in idxs]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[r[1] for r in refs])
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self._n_init_refs)
        res, bundle = self._init_multi(
            stacked, frame, keys,
            jnp.asarray(self._init_par_scale(), jnp.float32))
        self.init_attempts += 1
        p = np.asarray(bundle).reshape(self._n_init_refs, 7)

        # Acceptable candidates this frame: (score, ref_idx, t_dir,
        # n_good, v) for each unique reference whose pair verified —
        # v = baseline speed in the pair's own median-depth gauge
        # (|t| / dt), the scale-consistency observable.
        cands = []
        for i in range(n_uniq):
            if p[i, 0] > 0.5:
                dt = max(timestamp - refs[i][0], 1.0 / 120.0)
                cands.append((float(p[i, 1]), i, p[i, 3:6].copy(),
                              float(p[i, 2]), float(p[i, 6]) / dt))

        if os.environ.get("SLAM_INIT_DEBUG") == "1":
            det = " ".join(
                f"g{n - idxs[i]}:ok={int(p[i, 0])},s={p[i, 1]:.0f},"
                f"ng={p[i, 2]:.0f}" for i in range(n_uniq))
            print(f"# init t={timestamp:7.3f} att={self.init_attempts:3d} "
                  f"rejects={self._init_tdir_rejects} {det}",
                  file=sys.stderr, flush=True)

        def commit(score, i, n_good):
            res_i = jax.tree_util.tree_map(lambda x: x[i], res)
            self._commit_init(refs[i][1], frame, res_i, timestamp,
                              n_good=n_good)

        if cands:
            top = max(cands, key=lambda c: c[0])
            # Liveness-cap fallback pool: the best acceptable pair
            # seen this init phase (committed only if certification
            # keeps failing — see below).
            if self._init_best is None or top[0] > self._init_best[0]:
                res_top = jax.tree_util.tree_map(
                    lambda x: x[top[1]], res)
                self._init_best = (top[0], res_top, refs[top[1]][1],
                                   frame, timestamp, top[3])

            certified = None
            if tr.init_tdir_max_deg <= 0.0:
                certified = top          # gate disabled
            else:
                cosmax = float(np.cos(np.radians(tr.init_tdir_max_deg)))

                def agree(ca_dir, ca_v, cb_dir, cb_v):
                    # Direction reproducibility + SCALE consistency:
                    # two pairs seeing the same scene at different
                    # baselines must imply the same camera speed in
                    # the shared median-depth gauge. A rotation-
                    # ambiguous pair reconstructs its baseline 5-15x
                    # small (the round-4 collapse-tail mechanism), so
                    # agreeing directions with wildly different
                    # speeds mean one reconstruction is rotten —
                    # rejecting it here saves the commit + collapse
                    # probe + retry cycle (~20-40 frames on hard
                    # seeds; seed-93 forensics).
                    if float(np.dot(ca_dir, cb_dir)) < cosmax:
                        return False
                    band = tr.init_vel_band
                    if band <= 0:
                        return True
                    hi, lo = max(ca_v, cb_v), max(min(ca_v, cb_v), 1e-12)
                    return hi / lo <= band

                # Same-frame cross-reference agreement (the fast path).
                for a in range(len(cands)):
                    for b in range(a + 1, len(cands)):
                        if agree(cands[a][2], cands[a][4],
                                 cands[b][2], cands[b][4]):
                            c = max(cands[a], cands[b],
                                    key=lambda c: c[0])
                            if certified is None or c[0] > certified[0]:
                                certified = c
                # Cross-frame agreement: previous candidates are
                # comparable when fresh — within the scene-time window
                # OR from the immediately-previous attempt (the
                # liveness path for sparse wall-clock cadences; a
                # CPU-bound deployment processes ~1 fps of a 60 fps
                # producer and no two attempts ever land inside the
                # 0.12 s window — test_app_end_to_end deadlocked on
                # exactly that before the attempt-index clause).
                prev = self._init_prev_cands
                if certified is None and prev is not None and (
                        timestamp - prev[0] <= tr.init_tdir_window_s
                        or self.init_attempts - prev[1] == 1):
                    for c in cands:
                        for d_dir, d_v in prev[2]:
                            if agree(c[2], c[4], d_dir, d_v):
                                if certified is None \
                                        or c[0] > certified[0]:
                                    certified = c

            if certified is not None:
                commit(certified[0], certified[1], certified[3])
                return
            # Acceptable but uncertified: count toward the liveness
            # cap — erratic cadence or a strongly curved path can make
            # agreement impossible while the candidates are fine.
            self._init_tdir_rejects += 1
            if self._init_tdir_rejects >= tr.init_tdir_max_rejects:
                best = self._init_best
                self._commit_init(best[2], best[3], best[1], best[4],
                                  n_good=best[5])
                return
            self._init_prev_cands = (timestamp, self.init_attempts,
                                     [(c[2], c[4]) for c in cands])
        else:
            self._init_prev_cands = None

    def _track_pipelined(self, gray, timestamp: float,
                         ts_dev: float) -> TrackOutput:
        """Dispatch this frame with no host sync; fetch and act on the
        PREVIOUS frame's 12-float summary (whose device->host copy has
        been in flight since its dispatch). One frame of decision lag
        buys a tracking loop that is dispatch-bound instead of
        sync-latency-bound — on a remote-attached TPU that is the
        difference between ~8 fps and real-time. Keyframe decisions no
        longer ride this lag: they are made in-graph by the frame step
        itself."""
        # One queued wide/global polish slice rides ahead of the frame
        # dispatch (device work only — never blocks the host).
        if self._polish_queue:
            kind, lam, prune = self._polish_queue.pop(0)
            step = {"wide": self._wide_slice,
                    "global": self._global_slice,
                    "young": self._young_slice}[kind]
            self.map, dR, dt, big = step(
                self.map, jnp.asarray(lam, jnp.float32), jnp.asarray(prune))
            # Rebase the speculative chain ONLY on a large WIDE-polish
            # correction (device-side flag — see _polish_slice): small
            # gauge-settling deltas are absorbed by the next pose GN,
            # large drift corrections would otherwise strand the chain
            # outside the matcher window. Global slices are excluded:
            # they run right after a loop closure / weld whose apply
            # already rebased the chain explicitly — their large
            # settling deltas double-correct and worsen the revisit
            # (round-3 A/B: revisit ATE 0.013 -> 0.068 with the guard
            # on global slices).
            if kind in ("wide", "young"):
                self._st = self._rebase_st_cond(self._st, dR, dt, big)

        arr = jnp.asarray(gray)
        st_prev = self._st
        chain_break = jnp.asarray(self._reloc_boundary_next_kf)
        m2, st2, summary = self._frame_step(
            self.map, self._st, arr, ts_dev, chain_break)
        fut = self._fetch_pool.submit(np.asarray, summary)
        self._pending.append(dict(ts=timestamp, st_prev=st_prev, future=fut))
        self.map, self._st = m2, st2

        # Deterministic drain (round 3): ALWAYS process the summary at
        # lag ``pipeline_depth``, blocking on its background fetch if
        # it has not landed yet — the fetch has had ``depth`` frames of
        # dispatch time to overlap the RTT, so the block is rare and
        # short. Round 2's elastic drain (process-when-landed, stretch
        # under pressure) absorbed relay hiccups but made every
        # host-driven dispatch (maintenance, polish slices, loop
        # probes) land at a fetch-RTT-dependent position in the device
        # queue: numerically identical runs evolved DIFFERENT maps
        # (bench ATE was bimodal across identical invocations). The
        # schedule is part of the algorithm; it must not depend on the
        # network.
        depth = self.cfg.tracking.pipeline_depth
        while len(self._pending) > depth:
            if self.state not in (TRACKING_OK, TRACKING_RECENTLY_LOST):
                break
            self._ready.append(self._process_lagged())
        if self._ready:
            return self._ready.pop(0)
        # Pipeline warming up: repeat the last known output (with ITS
        # timestamp — re-stamping a stale pose corrupts trajectory
        # evaluation) but WITHOUT its backfill tuple: late poses are
        # one-shot, and repeating them double-counts the trajectory
        # (caught by a sweep seed reporting 96/90 frames tracked).
        if self._last_out is not None:
            if self._last_out.backfill:
                self._last_out = self._last_out._replace(backfill=())
            return self._last_out
        # No output yet this session (e.g. right after a collapse-retry
        # commit): never claim TRACKING_OK without a pose — consumers
        # index state==2 outputs by position.
        st = (TRACKING_NOT_INITIALIZED if self.state == TRACKING_OK
              else self.state)
        return TrackOutput(st, None, None, 0, timestamp)

    def _process_lagged(self, summary_np=None) -> TrackOutput:
        ent = self._pending.pop(0)
        tr = self.cfg.tracking
        if summary_np is not None:
            s = summary_np
        else:
            s = ent["future"].result()
        n_inl = int(s[S_INLIERS])
        pos, quat = s[S_POS:S_POS + 3], s[S_QUAT:S_QUAT + 4]
        inserted = s[S_KF] > 0.5
        n_kf = int(s[S_NKF])
        kf_slot = int(s[S_SLOT])
        ts = ent["ts"]

        if n_inl < tr.min_track_matches:
            # Tracking failure right after initialization means the
            # two-view geometry was bad (monocular init is a lottery on
            # low-parallax scenes): discard the young map and re-
            # initialize, like ORB-SLAM's reset-if-few-keyframes.
            if n_kf <= 5:
                self.reset()
                return TrackOutput(self.state, None, None, 0, ts)
            # The frame starved even after the in-graph wide rescue:
            # rewind the pose chain to before this frame and drop the
            # speculatively dispatched newer in-flight entries.
            self._st = ent["st_prev"]._replace(
                has_vel=jnp.asarray(False))
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

        # Young-map scale-collapse detector (TrackingConfig
        # init_collapse_*): a rotation-ambiguous init "tracks" with
        # healthy inliers while the streamed motion runs 10-80x slower
        # than the init baseline implied. Compare windowed velocity
        # against the init-pair baseline velocity while the map is
        # young; on collapse, discard the young map and re-initialize.
        # ONE-SHOT, first full window only: later windows are unusable
        # — measured healthy runs drift to ratio ~0.33 (seed 11) and
        # one healthy init_v was overestimated 6x (seed 57, third
        # window 0.17), while collapsed runs sit at 0.02-0.06 from the
        # VERY FIRST window. While the probe is pending the poses are
        # HELD, not emitted (the caller sees "initializing"): emitting
        # and then resetting would leave the consumer a trajectory
        # segment in a dead map's gauge — the measured cost was a
        # stream ATE WORSE than not resetting at all (seed 29: 0.085
        # no-reset -> 0.152 reset-after-emit, with the KF table fixed
        # 0.286 -> 0.0016 either way). On pass, the held poses flush
        # into the trajectory; on fail they are discarded with the map.
        if self._collapse_active and self._init_v:
            ts_rel = ts - (self._t0 or 0.0)
            age = ts_rel - (self.init_commit_ts or 0.0)
            trc = self._collapse_trace
            trc.append((ts_rel, np.asarray(pos, float)))
            if age > tr.init_collapse_horizon_s:
                self._collapse_active = False
            else:
                # Retry probes use the short window: catastrophic
                # ratios show in ~3 frames and the session is already
                # suspect — cheapness beats grey-zone resolution.
                win = (tr.init_collapse_retry_window_s
                       if self._collapse_resets > 0
                       else tr.init_collapse_window_s)
                span = ts_rel - trc[0][0]
                if span >= win:
                    v_est = float(np.linalg.norm(
                        trc[-1][1] - trc[0][1])) / span
                    ratio = v_est / max(self._init_v, 1e-9)
                    self._collapse_active = False
                    if os.environ.get("SLAM_COLLAPSE_DEBUG") == "1":
                        print(f"# collapse probe t={ts_rel:.2f} "
                              f"v_est {v_est:.4f} init_v "
                              f"{self._init_v:.4f} ratio {ratio:.3f}",
                              file=sys.stderr, flush=True)
                    if ratio < tr.init_collapse_frac:
                        self._collapse_resets += 1
                        self._collapse_retry(ts_rel)
                        # Even when the retry commits instantly, the
                        # NEW map's probe is pending — the consumer
                        # keeps seeing "initializing" (a state-2
                        # output here would carry no pose).
                        return TrackOutput(TRACKING_NOT_INITIALIZED,
                                           None, None, 0, ts)
            if not self._collapse_active:
                # Probe passed (or expired): the held prefix is real.
                # A pass also RE-ARMS the reset budget — the
                # max_resets bound exists to break infinite reset
                # loops in a degenerate world, not to disarm the
                # detector for the rest of a long session (or, when a
                # harness reuses one System across worlds, for every
                # later world). The held poses flush into BOTH the
                # stored trajectory and this frame's output stream
                # (TrackOutput.backfill) so live consumers see them.
                self._collapse_resets = 0
                for hts, hpos, hquat in self._held_outputs:
                    self._trajectory.append((hts, hpos, hquat))
                    self._backfill_pending.append((hts, hpos, hquat))
                self._held_outputs = []

        self._maybe_close_loop()
        self._maybe_weld()
        if inserted:
            self._on_keyframe_inserted(kf_slot, n_kf, ts, pos, quat)
        self._maybe_compact(n_kf)

        if self._collapse_active:
            # Probe still pending: hold this pose (flushed on pass,
            # discarded with the map on fail) and report the session
            # as still initializing.
            self._held_outputs.append((ts, np.asarray(pos),
                                       np.asarray(quat)))
            out = TrackOutput(TRACKING_NOT_INITIALIZED, None, None,
                              n_inl, ts)
            self._last_out = out
            return out

        self._trajectory.append((ts, pos, quat))
        bf = tuple(self._backfill_pending)
        self._backfill_pending = []
        out = TrackOutput(TRACKING_OK, pos, quat, n_inl, ts,
                          n_landmarks=int(s[S_NLM]), backfill=bf)
        self._last_out = out
        return out

    def _flush_pipeline(self, final: bool = False) -> List[TrackOutput]:
        """Drain in-flight frames (state transitions, shutdown).

        Returns the drained outputs (plus any outputs already sitting
        in the ready queue): these are REAL poses of frames dispatched
        while the pipeline was in flight — a consumer that stops
        feeding frames (end of sequence, shutdown) still gets them,
        like the reference backend's shutdown trajectory dump flushes
        everything it processed (orbslam3_mono_networked.cc:670).

        ``final=True`` (session end, never the mid-session state-
        transition call) additionally flushes poses HELD by a pending
        collapse probe: the probe never *failed* — those poses are the
        best estimate the session ever produced, and discarding them
        because the sequence ended mid-probe wipes the whole session's
        output when init committed late (TPU seed 104 forensics: a
        commit at t=2.9 s of a 3.0 s run left 0/90 frames emitted)."""
        outs = list(self._ready)
        self._ready.clear()
        while self._pending:
            if self.state not in (TRACKING_OK, TRACKING_RECENTLY_LOST):
                self._pending.clear()
                break
            outs.append(self._process_lagged())
        # An optimistic loop commit must not outlive the pipeline
        # unjudged (state transitions and shutdown both land here):
        # keyframe_poses()/map readers see the committed map.
        self._resolve_loop_sanity()
        if final and self._held_outputs:
            bf = tuple((hts, hpos, hquat)
                       for hts, hpos, hquat in self._held_outputs)
            for item in self._held_outputs:
                self._trajectory.append(item)
            self._held_outputs = []
            outs.append(TrackOutput(TRACKING_NOT_INITIALIZED, None, None,
                                    0, bf[-1][0], backfill=bf))
        return outs

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
        if int(res.n_inliers) >= self.cfg.tracking.reloc_min_matches:
            self._st = self._st._replace(
                R=res.R, t=res.t, R2=res.R, t2=res.t,
                has_vel=jnp.asarray(False))
            self.state = TRACKING_OK
            self._last_inliers = int(res.n_inliers)
            self._lost_frames = 0
            self._reloc_failures = 0
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
        t0 = self._t0
        attempts = self.loop_attempts
        n_init, ts_init = self.init_attempts, self.init_commit_ts
        self.reset()
        self._trajectory, self._kf_trajectory = traj, kf_traj
        self._key, self.atlas = key, atlas
        self.loops_closed, self.welds_done = loops, welds
        self.loop_attempts = attempts
        self.init_attempts, self.init_commit_ts = n_init, ts_init
        self._t0 = t0    # keep the session epoch across the map freeze

    def _maybe_close_loop(self) -> None:
        """Two-phase, one phase per drained frame:
        phase 1 — read the candidate score (its background fetch was
        submitted a full frame earlier, so the read almost never
        waits); if it clears the bar, dispatch the Sim3 verification
        and background-fetch ITS verdict; phase 2 — on a verified
        loop, dispatch the pose-graph correction, then enqueue
        global-BA polish slices (pure device work). Phase reads BLOCK
        on their future rather than polling ``done()``: the probe
        cadence — and every dispatch downstream of it — must be
        run-deterministic, not fetch-RTT-dependent (round-2 variance
        source)."""
        self._resolve_loop_sanity()            # phase 3 of a PRIOR apply
        if self._pending_loop is None:
            return
        tr = self.cfg.tracking

        if len(self._pending_loop) == 4:       # phase 1: score
            kf_slot, cands_prev, score_fut, cand_fut = self._pending_loop
            score = float(score_fut.result())
            cand_val = int(cand_fut.result())
            # Saturated ~1.0 scores are DEGENERATE, not excellent: a
            # genuine revisit differs in vantage, so near-perfect
            # signature cosines mean near-duplicate keyframes (a map
            # folded onto itself by a prior bad correction). They must
            # not arm the consistency counter (round-3 branch spree).
            if score <= tr.loop_score_min or score >= tr.loop_score_max:
                self._pending_loop = None
                self._loop_consistency = None
                self.loop_attempts.append(
                    (int(kf_slot), cand_val, score, None))
                return
            # Temporal consistency (KeyFrameDatabase's consistency
            # groups): the retrieval hit must point at the same map
            # REGION (within loop_consistency_radius slots) on
            # loop_consistency_kf consecutive keyframe probes before a
            # Sim3 verification is spent — one aliased-texture hit
            # cannot trigger a loop. _loop_consistency carries
            # (last candidate slot, consecutive consistent run length).
            prev = self._loop_consistency
            if (prev is not None
                    and abs(cand_val - prev[0])
                    <= tr.loop_consistency_radius):
                run = prev[1] + 1
            else:
                run = 1
            self._loop_consistency = (cand_val, run)
            if run < tr.loop_consistency_kf:
                self._pending_loop = None
                self.loop_attempts.append(
                    (int(kf_slot), cand_val, score, None))
                return
            kf_prev = jnp.asarray(kf_slot, jnp.int32)
            self._key, sub = jax.random.split(self._key)
            loop, cand_sel = self._loop_sim3(self.map, kf_prev,
                                             cands_prev, sub)
            ok_fut = self._fetch_pool.submit(np.asarray, loop.ok)
            self._pending_loop = (
                kf_slot, cand_sel, cand_fut, score, loop, ok_fut)
            return

        # phase 2: Sim3 verdict (blocking read, same rationale)
        kf_slot, cand_prev, cand_fut, score, loop, ok_fut = \
            self._pending_loop
        self._pending_loop = None
        verified = bool(ok_fut.result())
        if not verified:
            self.loop_attempts.append(
                (int(kf_slot), int(cand_fut.result()), score, False, None))
            return
        # Verified: dispatch the correction and commit OPTIMISTICALLY.
        # The sanity medians ride a background fetch and are judged at
        # the NEXT drained frame (phase 3) — synchronously fetching
        # them here serialized the frame loop on the full loop-apply
        # execution + RTT (the round-4 long bench's worst frame-time
        # events, max 1426 ms). Sanity rejections are rare (the score
        # band / starved-KF / scale-band guards run first), so the
        # optimistic path is almost always right; on a rejection the
        # pre-apply map snapshot is restored and the chain inverse-
        # rebased, at the cost of one frame's map evolution — cheaper
        # than stalling every applied closure.
        kf_prev = jnp.asarray(kf_slot, jnp.int32)
        m_pre = self.map
        m2, dR, dt, med_b, med_a = self._loop_apply(
            self.map, kf_prev, cand_prev, loop)
        self.map = m2
        self._st = self._rebase_st(self._st, dR, dt)
        self._pending_loop_sanity = dict(
            kf_slot=int(kf_slot), cand_prev=cand_prev,
            cand_top=int(cand_fut.result()), score=score,
            m_pre=m_pre, dR=dR, dt=dt,
            med_fut=self._fetch_pool.submit(
                lambda a, b: (np.asarray(a), np.asarray(b)),
                med_b, med_a))

    def _resolve_loop_sanity(self) -> None:
        """Phase 3 of _maybe_close_loop: judge the post-correction
        reprojection sanity of an optimistically-committed closure —
        a Sim3-verified candidate can still warp the whole map when
        its PGO edge contradicts the chain (round-3 branch spree:
        per-KF error ~0.6 everywhere after the late closures)."""
        if self._pending_loop_sanity is None:
            return
        tr = self.cfg.tracking
        p = self._pending_loop_sanity
        self._pending_loop_sanity = None
        med_b, med_a = (float(x) for x in p["med_fut"].result())
        sane = (not np.isfinite(med_a)) or med_a <= max(
            tr.loop_sanity_px,
            tr.loop_sanity_factor * max(med_b, 1e-6))
        applied = None
        if sane:
            self._enqueue_polish("global",
                                 self.cfg.tracking.global_ba_slices)
            self.loops_closed += 1
            self.session_loops_applied += 1
            self._last_loop_nkf = self._n_kf_host
            # The candidate the multi-candidate verification chose
            # (may differ from the retrieval-top slot recorded below).
            applied = int(np.asarray(p["cand_prev"]))
            verified = True
        else:
            # Roll back: restore the pre-apply snapshot (one frame of
            # map evolution on the warped lineage is discarded) and
            # inverse-rebase the speculative chain.
            self.map = p["m_pre"]
            dR, dt = p["dR"], p["dt"]
            dR_inv = dR.T
            self._st = self._rebase_st(self._st, dR_inv,
                                       -(dR_inv @ dt))
            self._pending_loop = None
            self._loop_consistency = None
            verified = "rejected"   # distinguishable in the log
        self.loop_attempts.append(
            (p["kf_slot"], p["cand_top"], p["score"], verified, applied))

    def _maybe_weld(self) -> None:
        """Evaluate a pending atlas-weld probe: if the new keyframe
        retrieval-hits a frozen map, verify a cross-map Sim(3) and weld
        the frozen map into the active one (LoopClosing::MergeLocal)."""
        if self._pending_weld is None:
            return
        tr = self.cfg.tracking

        if len(self._pending_weld) == 2:       # phase 1: scores
            kf_slot, cands = self._pending_weld
            # Blocking reads — deterministic weld cadence (see
            # _maybe_close_loop).
            self._pending_weld = None
            scores = [float(fut.result()) for _, fut in cands]
            best_i = int(np.argmax(scores))
            if os.environ.get("SLAM_WELD_DEBUG") == "1":
                print(f"# weld probe kf={kf_slot} scores={scores} "
                      f"min={tr.loop_score_min}",
                      file=sys.stderr, flush=True)
            if scores[best_i] <= tr.loop_score_min:
                return
            self._key, sub = jax.random.split(self._key)
            res = self._atlas_sim3(
                self.map, self.atlas[best_i],
                jnp.asarray(kf_slot, jnp.int32), cands[best_i][0], sub)
            ok_fut = self._fetch_pool.submit(np.asarray, res.ok)
            self._pending_weld = (best_i, res, ok_fut)
            return

        # phase 2: cross-map Sim3 verdict (blocking read)
        best_i, res, ok_fut = self._pending_weld
        self._pending_weld = None
        if os.environ.get("SLAM_WELD_DEBUG") == "1":
            print(f"# weld sim3 ok={bool(ok_fut.result())} "
                  f"n_matches={int(np.asarray(res.n_matches))} "
                  f"s={float(np.asarray(res.sim3.s)):.3f}",
                  file=sys.stderr, flush=True)
        if not bool(ok_fut.result()) or best_i >= len(self.atlas):
            return
        # The import changes slot structure: judge any optimistic loop
        # commit first (its rollback snapshot is pre-weld).
        self._resolve_loop_sanity()
        frozen = self.atlas[best_i]
        self.map, n_kf_imp, n_lm_imp = self._atlas_weld(
            self.map, frozen, res.sim3.s, res.sim3.R, res.sim3.t)
        self.atlas.pop(best_i)
        self._slots_used = int(np.asarray(self.map.n_kf))
        self._n_kf_host = max(self._n_kf_host, self._slots_used)
        # Whole-map refinement welds the seams (RunGlobalBundle-
        # Adjustment after a merge) — sliced, one iteration per frame.
        self._enqueue_polish("global", self.cfg.tracking.global_ba_slices)
        self.welds_done += 1
        self._pending_loop = None   # slot-stale after import
        # Imported keyframes change the covisibility structure.
        self._st = self._st._replace(ba_window=self._covis_window(self.map))

    def _enqueue_polish(self, kind: str, n_slices: int) -> None:
        """Queue ``n_slices`` single-iteration BA slices with a decaying
        damping schedule; pruning arms on the final slice only (pruning
        an under-converged window eats true observations)."""
        base = self.cfg.tracking.ba_slice_damping
        self._polish_queue = [
            (kind, max(base * (0.5 ** i), base * 1e-2),
             i == n_slices - 1)
            for i in range(n_slices)]

    def _maybe_compact(self, n_kf_lagged: int) -> None:
        """Host-side capacity management. The in-graph keyframe guard
        stops inserting at MK-1; the host compacts (and if needed
        force-culls) when the LAGGED count approaches capacity, with
        margin for in-flight inserts. A short cooldown stops a
        saturated-but-uncullable table from re-compacting every
        frame."""
        cfg = self.cfg
        MK = cfg.map.max_keyframes
        if self._compact_cooldown > 0:
            self._compact_cooldown -= 1
            return
        if n_kf_lagged < MK - 2:
            return
        # A pending loop-sanity verdict holds a PRE-COMPACT map
        # snapshot; judge it now or a later rollback would resurrect
        # stale slot ids.
        self._resolve_loop_sanity()
        self._compact_cooldown = cfg.tracking.kf_min_interval + 1
        self.map, n_valid = self._compact_step(self.map)
        self._slots_used = int(np.asarray(n_valid))
        # Slot ids shifted: pending slot-addressed probes and the
        # carried covis window are stale.
        self._pending_loop = None
        self._pending_weld = None
        self._loop_consistency = None
        self._st = self._st._replace(ba_window=self._covis_window(self.map))
        if self._slots_used >= MK - 2:
            # Organic 90%-redundancy culling freed nothing: evict
            # the most redundant unprotected keyframe instead.
            self.map, _nc = self._forced_cull_step(self.map)
            self.map, n_valid = self._compact_step(self.map)
            self._slots_used = int(np.asarray(n_valid))
            self._st = self._st._replace(
                ba_window=self._covis_window(self.map))

    def _on_keyframe_inserted(self, kf_slot: int, n_kf: int, ts: float,
                              pos, quat) -> None:
        """Keyframe-rate host reactions to an IN-GRAPH insert, learned
        from the lagged summary: maintenance dispatch, wide-BA polish
        scheduling, loop-closing probe, atlas weld probe, trajectory
        bookkeeping."""
        self._n_kf_host += 1
        self.session_kf_inserted += 1
        self._slots_used = n_kf
        self._reloc_boundary_next_kf = False
        self._kf_trajectory.append((ts, np.asarray(pos), np.asarray(quat)))

        # LocalMapping tail: zero-obs pruning + redundant-KF culling.
        self.map = self._maintain_step(self.map)

        # Young-map re-solve (one-shot per map): once a few keyframes
        # exist, a short ONE-anchor BA burst lets the accumulated
        # multi-view observations correct the committed two-view init's
        # relative pose — the >=2-anchor policy everywhere else freezes
        # a slightly-bent low-parallax init into the session gauge
        # (round-5 tail forensics; see _young_slice).
        tr = self.cfg.tracking
        # (deferred while a collapse probe is pending: the one-anchor
        # burst rescales the map, which would break the probe's
        # velocity-gauge comparison — it re-arms at the next keyframe)
        if tr.young_ba_at_kf > 0 and not self._young_polish_done \
                and self._had_collapse_reset \
                and n_kf >= tr.young_ba_at_kf \
                and not self._collapse_active \
                and not self._polish_queue \
                and self._tail_ready.is_set():
            self._young_polish_done = True
            self._enqueue_polish("young", tr.young_ba_slices)

        # Periodic wide-window polish (sliced): grinds down accumulated
        # drift and residual init error the marching local window
        # cannot reach.
        if tr.wide_ba_every_kf > 0 \
                and self._n_kf_host % tr.wide_ba_every_kf == 0 \
                and not self._polish_queue \
                and self._tail_ready.is_set():
            self._enqueue_polish("wide", tr.wide_ba_slices)

        # Loop closing: dispatch the candidate retrieval now; its score
        # is read lazily a few frames later (_maybe_close_loop at frame
        # rate) once the device->host copy has completed.
        # Cooldown after an APPLIED closure: the map is mid-polish
        # (global-BA slices queued) and retrieval against the
        # half-corrected state produces the degenerate-score spree.
        if (kf_slot >= tr.loop_min_gap_kf and self._pending_loop is None
                and self._tail_ready.is_set()
                and self._last_inliers >= tr.loop_min_track_inliers
                and self._n_kf_host - self._last_loop_nkf
                >= tr.loop_cooldown_kf):
            kf_dev = jnp.asarray(kf_slot, jnp.int32)
            cands, scores = self._loop_candidate(self.map, kf_dev)
            self._pending_loop = (
                kf_slot, cands,
                self._fetch_pool.submit(np.asarray, scores[0]),
                self._fetch_pool.submit(np.asarray, cands[0]))

        # Atlas weld probe: score the new keyframe's signature against
        # every frozen map's keyframe database; evaluated lazily once
        # the background fetch lands.
        if self.atlas and self._pending_weld is None:
            sig = self.map.kf_signature[kf_slot]
            cands = []
            for fz in self.atlas:
                c, sc = self._atlas_cand(fz, sig)
                cands.append((c, self._fetch_pool.submit(np.asarray, sc)))
            self._pending_weld = (kf_slot, cands)

    # ------------------------------------------------------------------

    def _twc(self) -> Tuple[np.ndarray, np.ndarray]:
        Rwc, twc = se3_inverse(self._st.R, self._st.t)
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
        n_dev = int(np.asarray(self.map.n_kf))
        if n_dev == 0:
            return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        valid = np.asarray(self.map.kf_valid)
        n = min(n_dev, self.map.max_keyframes)
        sel = np.nonzero(valid[:n])[0]
        if len(sel) == 0:
            return np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        Rws, tws = se3_inverse(self.map.kf_R[sel], self.map.kf_t[sel])
        quats = quat_from_rotmat(Rws)
        # Device timestamps are session-relative; re-anchor to the
        # absolute epoch for export (TUM eval associates on it).
        t0 = self._t0 or 0.0
        return (t0 + np.asarray(self.map.kf_timestamp[sel], np.float64),
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
        """Resume from a checkpoint: tracking restarts by
        relocalization against the loaded landmarks (multi-session
        mapping, BASELINE.json config 5)."""
        from send_slam_tpu.io.map_io import load_map
        self.map = load_map(path)
        self._n_kf_host = int(self.map.n_kf)
        self._slots_used = self._n_kf_host
        self.state = TRACKING_LOST
        self._init_frames.clear()
        self._lost_frames = 0
        self._st = self._st._replace(
            ba_window=self._covis_window(self.map))

    def shutdown(self) -> List[TrackOutput]:
        """Final drain (reference: shutdown saves everything processed,
        orbslam3_mono_networked.cc:670): flushes in-flight pipeline
        frames AND collapse-probe-held poses into the trajectory, and
        returns them for consumers that relay poses live. Idempotent —
        a second call finds the queues empty."""
        return self._flush_pipeline(final=True)
