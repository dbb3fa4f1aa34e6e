"""The on-device SLAM map: fixed-capacity struct-of-arrays.

TPU-native re-design of ORB-SLAM3's Map/Atlas/KeyFrame/MapPoint pointer
graph (slam_backends/orb_slam_3/CMakeLists.txt:56-59). The C++ code
grows std::set graphs of heap objects; on TPU the map is a pytree of
preallocated arrays with validity masks:

- keyframes: poses (camera-from-world), timestamps, and their full
  fixed-capacity keypoint tables (uv, descriptors, octaves);
- the observation structure is one dense (max_kf, n_kp) int32 table
  ``kf_obs_lm`` mapping each keypoint slot to its landmark id (-1 =
  none) — the inverse of MapPoint::mObservations, chosen because the
  keypoint axis is the static one;
- landmarks: positions, representative descriptors, reference KF.

All mutation functions are functional (return a new MapState) and
jittable: slot allocation is masked cumsum arithmetic, not malloc.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import MapConfig
from send_slam_tpu.models.retrieval import N_BUCKETS, frame_signature


class MapState(NamedTuple):
    # --- keyframes -----------------------------------------------------
    kf_R: jnp.ndarray         # (MK,3,3) camera-from-world
    kf_t: jnp.ndarray         # (MK,3)
    kf_timestamp: jnp.ndarray  # (MK,)
    kf_valid: jnp.ndarray     # (MK,) bool
    kf_uv: jnp.ndarray        # (MK,N,2) undistorted keypoints
    kf_desc: jnp.ndarray      # (MK,N,8) uint32
    kf_octave: jnp.ndarray    # (MK,N) int32
    kf_kp_valid: jnp.ndarray  # (MK,N) bool
    kf_obs_lm: jnp.ndarray    # (MK,N) int32 — landmark id or -1
    kf_signature: jnp.ndarray  # (MK,B) f32 — retrieval signature
    # True where the chain edge INTO this keyframe crosses a
    # relocalization (the relative pose is a jump, not motion); such
    # edges are excluded from the essential graph (covisibility.py).
    kf_chain_break: jnp.ndarray  # (MK,) bool
    # --- landmarks -----------------------------------------------------
    lm_pos: jnp.ndarray       # (ML,3)
    lm_desc: jnp.ndarray      # (ML,8) uint32
    lm_valid: jnp.ndarray     # (ML,) bool
    lm_ref_kf: jnp.ndarray    # (ML,) int32
    lm_visible: jnp.ndarray   # (ML,) int32 — times predicted in view
    lm_found: jnp.ndarray     # (ML,) int32 — times matched as inlier
    # MapPoint viewing statistics (ORB-SLAM3 MapPoint::GetNormal /
    # GetMin/MaxDistanceInvariance, CMakeLists.txt:56): mean viewing
    # direction and the scale-invariance distance band derived from the
    # reference observation's octave. dist_max == 0 marks "no viewing
    # info" (e.g. landmarks imported by a cross-map merge) — gating
    # must pass those through.
    lm_normal: jnp.ndarray    # (ML,3) f32 unit mean viewing direction
    lm_dist_min: jnp.ndarray  # (ML,) f32
    lm_dist_max: jnp.ndarray  # (ML,) f32
    # Representative-descriptor refresh (MapPoint::ComputeDistinctive-
    # Descriptors): instead of re-picking the medoid among stored
    # observations (a per-landmark variable-size loop), keep bitwise
    # vote counts over observations — the majority vector minimizes the
    # total Hamming distance to all observations, and the update is one
    # scatter-add per keyframe insertion.
    lm_bit_votes: jnp.ndarray   # (ML,256) int32
    lm_vote_count: jnp.ndarray  # (ML,) int32
    # --- counters ------------------------------------------------------
    n_kf: jnp.ndarray         # () int32 — keyframes appended so far

    @property
    def max_keyframes(self) -> int:
        return self.kf_R.shape[0]

    @property
    def max_landmarks(self) -> int:
        return self.lm_pos.shape[0]

    @property
    def n_keypoints(self) -> int:
        return self.kf_uv.shape[1]

    def n_landmarks(self) -> jnp.ndarray:
        return jnp.sum(self.lm_valid.astype(jnp.int32))


def empty_map(cfg: MapConfig, n_keypoints: int, dtype=jnp.float32) -> MapState:
    MK, ML, N = cfg.max_keyframes, cfg.max_landmarks, n_keypoints
    return MapState(
        kf_R=jnp.tile(jnp.eye(3, dtype=dtype), (MK, 1, 1)),
        kf_t=jnp.zeros((MK, 3), dtype),
        kf_timestamp=jnp.zeros((MK,), dtype),
        kf_valid=jnp.zeros((MK,), bool),
        kf_uv=jnp.zeros((MK, N, 2), dtype),
        kf_desc=jnp.zeros((MK, N, 8), jnp.uint32),
        kf_octave=jnp.zeros((MK, N), jnp.int32),
        kf_kp_valid=jnp.zeros((MK, N), bool),
        kf_obs_lm=jnp.full((MK, N), -1, jnp.int32),
        kf_signature=jnp.zeros((MK, N_BUCKETS), jnp.float32),
        kf_chain_break=jnp.zeros((MK,), bool),
        lm_pos=jnp.zeros((ML, 3), dtype),
        lm_desc=jnp.zeros((ML, 8), jnp.uint32),
        lm_valid=jnp.zeros((ML,), bool),
        lm_ref_kf=jnp.full((ML,), -1, jnp.int32),
        lm_visible=jnp.zeros((ML,), jnp.int32),
        lm_found=jnp.zeros((ML,), jnp.int32),
        lm_normal=jnp.zeros((ML, 3), dtype),
        lm_dist_min=jnp.zeros((ML,), dtype),
        lm_dist_max=jnp.zeros((ML,), dtype),
        lm_bit_votes=jnp.zeros((ML, 256), jnp.int32),
        lm_vote_count=jnp.zeros((ML,), jnp.int32),
        n_kf=jnp.asarray(0, jnp.int32),
    )


def insert_keyframe(
    m: MapState,
    R: jnp.ndarray, t: jnp.ndarray, timestamp,
    kp_uv: jnp.ndarray, kp_desc: jnp.ndarray, kp_octave: jnp.ndarray,
    kp_valid: jnp.ndarray,
    obs_lm: jnp.ndarray,
    chain_break=False,
) -> Tuple[MapState, jnp.ndarray]:
    """Append a keyframe at slot n_kf. obs_lm: (N,) landmark id per
    keypoint (-1 none) — the tracked associations at insertion time.
    chain_break marks the edge into this KF as a relocalization jump.
    Returns (new_map, kf_id)."""
    i = m.n_kf
    m = m._replace(
        kf_chain_break=m.kf_chain_break.at[i].set(chain_break),
        kf_R=m.kf_R.at[i].set(R),
        kf_t=m.kf_t.at[i].set(t),
        kf_timestamp=m.kf_timestamp.at[i].set(timestamp),
        kf_valid=m.kf_valid.at[i].set(True),
        kf_uv=m.kf_uv.at[i].set(kp_uv),
        kf_desc=m.kf_desc.at[i].set(kp_desc),
        kf_octave=m.kf_octave.at[i].set(kp_octave),
        kf_kp_valid=m.kf_kp_valid.at[i].set(kp_valid),
        kf_obs_lm=m.kf_obs_lm.at[i].set(obs_lm),
        kf_signature=m.kf_signature.at[i].set(
            frame_signature(kp_desc, kp_valid)),
        n_kf=m.n_kf + 1,
    )
    return m, i


def _free_slots(valid: jnp.ndarray, n_new: int) -> jnp.ndarray:
    """Indices of the first n_new invalid slots (padded with the last
    slot if the table overflows — callers gate on capacity)."""
    # rank among invalid slots: 0-based position of each free slot.
    order = jnp.cumsum((~valid).astype(jnp.int32)) - 1
    # slot for new item j = first index where (~valid) and order == j.
    size = valid.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    cand = jnp.where(~valid, order, size + 1)
    # scatter: slots[j] = i where cand[i] == j; misses index out of
    # bounds and are dropped.
    slots = jnp.full((n_new,), size - 1, jnp.int32)
    hit = cand < n_new
    slots = slots.at[jnp.where(hit, cand, n_new)].set(idx, mode="drop")
    return slots


def add_landmarks(
    m: MapState,
    pos: jnp.ndarray,          # (P,3) candidate positions
    desc: jnp.ndarray,         # (P,8) descriptors
    good: jnp.ndarray,         # (P,) bool — which candidates to add
    ref_kf: jnp.ndarray,       # () int32 — reference keyframe id
    kf_a: jnp.ndarray, kp_idx_a: jnp.ndarray,   # observation A
    kf_b: jnp.ndarray, kp_idx_b: jnp.ndarray,   # observation B
    normal: jnp.ndarray = None,    # (P,3) viewing direction at creation
    dist_min: jnp.ndarray = None,  # (P,) scale-invariance band
    dist_max: jnp.ndarray = None,
) -> Tuple[MapState, jnp.ndarray]:
    """Insert up to P new landmarks at free slots; register observations
    in keyframes kf_a, kf_b at keypoint rows kp_idx_*.

    Candidates with good=False write to a dump slot via masked scatter.
    Returns (map, lm_ids (P,) with -1 for rejected)."""
    P = pos.shape[0]
    ML = m.max_landmarks
    if normal is None:
        normal = jnp.zeros((P, 3), pos.dtype)
    if dist_min is None:
        dist_min = jnp.zeros((P,), pos.dtype)
    if dist_max is None:
        dist_max = jnp.zeros((P,), pos.dtype)
    # Compact ranks of good candidates -> free slot list.
    rank = jnp.cumsum(good.astype(jnp.int32)) - 1           # (P,)
    slots = _free_slots(m.lm_valid, P)                       # (P,)
    lm_id = jnp.where(good, slots[jnp.clip(rank, 0, P - 1)], -1)

    # Capacity guard: drop candidates that would overflow.
    overflow = jnp.sum((~m.lm_valid).astype(jnp.int32)) <= rank
    lm_id = jnp.where(overflow, -1, lm_id)
    good = good & (lm_id >= 0)

    # Rejected rows scatter to index ML, which is out of bounds and
    # silently dropped (mode="drop") — no masked read-modify-write.
    scatter_idx = jnp.where(good, lm_id, ML)
    lm_pos = m.lm_pos.at[scatter_idx].set(pos, mode="drop")
    lm_desc = m.lm_desc.at[scatter_idx].set(desc, mode="drop")
    lm_valid = m.lm_valid.at[scatter_idx].set(True, mode="drop")
    lm_ref = m.lm_ref_kf.at[scatter_idx].set(ref_kf, mode="drop")
    lm_visible = m.lm_visible.at[scatter_idx].set(1, mode="drop")
    lm_found = m.lm_found.at[scatter_idx].set(1, mode="drop")
    lm_normal = m.lm_normal.at[scatter_idx].set(normal, mode="drop")
    lm_dmin = m.lm_dist_min.at[scatter_idx].set(dist_min, mode="drop")
    lm_dmax = m.lm_dist_max.at[scatter_idx].set(dist_max, mode="drop")
    from send_slam_tpu.ops.hamming import unpack_u32_to_bits
    bits = unpack_u32_to_bits(desc, dtype=jnp.int32)       # (P,256)
    lm_votes = m.lm_bit_votes.at[scatter_idx].set(bits, mode="drop")
    lm_vcnt = m.lm_vote_count.at[scatter_idx].set(1, mode="drop")

    # Observations: kf_obs_lm[kf, kp_idx] = lm_id.
    def write_obs(obs, kf, kp_idx):
        row = obs[kf]
        drop_kp = jnp.where(good, kp_idx, row.shape[0])
        new_row = row.at[drop_kp].set(lm_id, mode="drop")
        return obs.at[kf].set(new_row)

    obs = write_obs(m.kf_obs_lm, kf_a, kp_idx_a)
    obs = write_obs(obs, kf_b, kp_idx_b)

    # NOTE: every computed field must make it into the _replace — a
    # round-4 audit found normals/scale-bands/bit-votes silently
    # dropped here, which left ALL triangulated landmarks with
    # dist_max=0 and therefore permanently exempt from the tracking
    # view-angle/distance/octave gates (frame-path `has` mask) — the
    # whole scale-consistency machinery was inert.
    m = m._replace(lm_pos=lm_pos, lm_desc=lm_desc, lm_valid=lm_valid,
                   lm_ref_kf=lm_ref, lm_visible=lm_visible,
                   lm_found=lm_found, kf_obs_lm=obs,
                   lm_normal=lm_normal, lm_dist_min=lm_dmin,
                   lm_dist_max=lm_dmax, lm_bit_votes=lm_votes,
                   lm_vote_count=lm_vcnt)
    return m, lm_id


def refresh_landmarks(m: MapState, kf_id: jnp.ndarray,
                      scale_factor: float = 1.2,
                      n_levels: int = 8) -> MapState:
    """Fold keyframe kf_id's observations into per-landmark viewing
    normals (incremental mean direction — MapPoint::UpdateNormalAndDepth)
    and descriptor bit votes, then re-derive each landmark's
    representative descriptor as the bitwise majority
    (ComputeDistinctiveDescriptors' role: minimize summed Hamming
    distance to the observations). Landmarks observed by this keyframe
    also get their SCALE-INVARIANCE BAND recomputed from the current
    distance and observation octave — exactly what UpdateNormalAndDepth
    does. Bands frozen at creation rot as the map's scale moves (BA
    gauge drift, Sim3 loop corrections): the round-4 flagship lap
    session starved progressively (found/visible median 0.14) because
    the tracking distance gate was comparing post-correction distances
    against creation-time bands.

    TPU layout: ``kf_obs_lm`` is a PARTIAL 1-1 MATCHING (each keypoint
    observes <= 1 landmark and each landmark appears <= once per
    keyframe — the insert inverts a per-landmark kp index), so the
    naive scatter-adds here are really masked per-landmark updates:
    the viewing direction is computed DENSELY for every landmark row
    (no gather), and the <= 1-term "sums" (has-an-observation mask,
    descriptor bit row) are one bf16 one-hot matmul each, built in the
    (ML, N) orientation the matmul consumes (ops/segsum lesson). All
    products are {0,1} x {0,1} with at most one nonzero term per
    output, so the bf16 path is EXACT and the results are bit-identical
    to the scatter form."""
    from send_slam_tpu.ops.hamming import pack_bits_to_u32, unpack_u32_to_bits

    ML = m.max_landmarks
    obs = m.kf_obs_lm[kf_id]                       # (N,)
    rows = jnp.arange(ML, dtype=obs.dtype)
    # obs = -1 (no landmark) matches no row; no masking needed.
    oh = (rows[:, None] == obs[None, :]).astype(jnp.bfloat16)   # (ML,N)
    has_obs = (oh @ jnp.ones_like(obs, jnp.bfloat16)) > 0.5     # (ML,)

    # Dense per-landmark viewing direction from this keyframe's center
    # (exactly what the gathered per-keypoint form computed, row-for-row).
    R, t = m.kf_R[kf_id], m.kf_t[kf_id]
    C = -(R.T @ t[:, None])[:, 0]
    d = m.lm_pos - C[None]
    dirs = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

    add_dir = jnp.where(has_obs[:, None], dirs, 0.0)
    mixed = m.lm_normal * m.lm_vote_count[:, None].astype(m.lm_pos.dtype) \
        + add_dir
    nrm = jnp.linalg.norm(mixed, axis=-1, keepdims=True)
    new_normal = jnp.where(nrm > 1e-6, mixed / jnp.maximum(nrm, 1e-6),
                           m.lm_normal)

    bits = unpack_u32_to_bits(m.kf_desc[kf_id], dtype=jnp.int32)  # (N,256)
    # <=1 nonzero term per (landmark, bit) -> the bf16 matmul is exact.
    bit_row = (oh @ bits.astype(jnp.bfloat16)).astype(jnp.int32)  # (ML,256)
    votes = m.lm_bit_votes + bit_row
    vcnt = m.lm_vote_count + has_obs.astype(jnp.int32)
    majority = (2 * votes > vcnt[:, None]).astype(jnp.uint32)
    new_desc = pack_bits_to_u32(majority)
    lm_desc = jnp.where((m.lm_valid & (vcnt > 0))[:, None],
                        new_desc, m.lm_desc)

    # Band refresh from the CURRENT distance + this observation's
    # octave. The octave rides the same exact one-hot (<=1 term per
    # landmark; small ints are exact in bf16).
    oct_row = (oh @ m.kf_octave[kf_id].astype(jnp.bfloat16)) \
        .astype(jnp.float32)                                    # (ML,)
    dist = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-6)
    dmax_new = dist * scale_factor ** oct_row
    dmin_new = dmax_new / (scale_factor ** (n_levels - 1))
    upd = has_obs & m.lm_valid & (m.lm_dist_max > 0)
    dmin = jnp.where(upd, dmin_new, m.lm_dist_min)
    dmax = jnp.where(upd, dmax_new, m.lm_dist_max)

    return m._replace(lm_normal=new_normal, lm_bit_votes=votes,
                      lm_vote_count=vcnt, lm_desc=lm_desc,
                      lm_dist_min=dmin, lm_dist_max=dmax)


def update_landmark_stats(
    m: MapState, in_view: jnp.ndarray, found: jnp.ndarray,
) -> MapState:
    """Per-frame tracking statistics (MapPoint::IncreaseVisible/Found):
    in_view, found: (ML,) bool over landmark rows."""
    return m._replace(
        lm_visible=m.lm_visible + (in_view & m.lm_valid).astype(jnp.int32),
        lm_found=m.lm_found + (found & m.lm_valid).astype(jnp.int32),
    )


def cull_landmarks(
    m: MapState, min_visible: int = 4, min_found_ratio: float = 0.25,
    probation_kfs: int = 3,
) -> Tuple[MapState, jnp.ndarray]:
    """Remove unreliable landmarks (LocalMapping::MapPointCulling):
    enough visibility opportunities but rarely actually matched —
    but ONLY during a probation window after creation (ORB-SLAM culls
    within ~3 keyframes of birth). A mature landmark that later leaves
    the field of view accumulates visible-without-found and must NOT be
    culled, or the map self-destructs right before every loop closure.
    Their observation-table entries are cleared. Returns (map, n_culled).
    """
    vis = m.lm_visible.astype(jnp.float32)
    fnd = m.lm_found.astype(jnp.float32)
    young = m.lm_ref_kf >= (m.n_kf - probation_kfs)
    bad = m.lm_valid & young & (m.lm_visible >= min_visible) \
        & (fnd < min_found_ratio * vis)
    lm_valid = m.lm_valid & ~bad
    # Clear observation entries that point at culled landmarks.
    obs = m.kf_obs_lm
    obs_bad = bad[jnp.clip(obs, 0, m.max_landmarks - 1)] & (obs >= 0)
    obs = jnp.where(obs_bad, -1, obs)
    return m._replace(lm_valid=lm_valid, kf_obs_lm=obs), \
        jnp.sum(bad.astype(jnp.int32))


def prune_zero_obs_landmarks(m: MapState) -> MapState:
    """Invalidate landmarks with fewer than 2 observations in the
    keyframe table (they cannot be triangulated/BA'd). Landmarks with
    ref_kf < 0 are exempt: those were imported by a cross-map merge
    (parallel/map_merge.py) and intentionally carry no local
    observations."""
    ML = m.max_landmarks
    flat = m.kf_obs_lm.reshape(-1)
    ok = (flat >= 0).astype(jnp.int32)
    counts = jnp.zeros((ML,), jnp.int32).at[
        jnp.where(flat >= 0, flat, ML)].add(ok, mode="drop")
    keep = m.lm_valid & ((counts >= 2) | (m.lm_ref_kf < 0))
    # Clear dangling single observations too.
    obs = m.kf_obs_lm
    dangling = (obs >= 0) & ~keep[jnp.clip(obs, 0, ML - 1)]
    obs = jnp.where(dangling, -1, obs)
    return m._replace(lm_valid=keep, kf_obs_lm=obs)


def record_observations(
    m: MapState, kf_id: jnp.ndarray,
    lm_ids: jnp.ndarray, kp_idx: jnp.ndarray, valid: jnp.ndarray,
) -> MapState:
    """Register existing-landmark observations on keyframe kf_id:
    kf_obs_lm[kf_id, kp_idx[j]] = lm_ids[j] where valid."""
    row = m.kf_obs_lm[kf_id]
    drop = jnp.where(valid, kp_idx, row.shape[0])
    new_row = row.at[drop].set(lm_ids, mode="drop")
    return m._replace(kf_obs_lm=m.kf_obs_lm.at[kf_id].set(new_row))
