"""Atlas multi-map: freeze the active map on prolonged tracking loss,
start a fresh one, and weld the two back together when place
recognition finds the overlap.

TPU-native re-design of ORB-SLAM3's Atlas + LoopClosing::MergeLocal
(slam_backends/orb_slam_3/CMakeLists.txt:58,51). The C++ Atlas keeps a
set of heap Map objects and welds keyframe/point graphs pointer-by-
pointer; here a frozen map is just another fixed-capacity MapState
pytree parked on device, and the weld is one jitted step:

- cross-map Sim(3): descriptor-match two keyframes (one per map) on the
  MXU, take pairs where both sides observe a landmark, Umeyama-RANSAC
  the two WORLD-frame clouds (each map is internally consistent, so the
  world->world similarity is what the weld needs);
- keyframe import: frozen keyframes are Sim(3)-transformed into the
  active world and appended as a chain segment (the slot order inside
  the segment keeps the frozen temporal order; the segment's first
  keyframe carries kf_chain_break, because active->frozen adjacency is
  not motion);
- landmark import: frozen landmarks transform into the active frame and
  take free table slots (masked scatter allocation); the imported
  keyframes' observation rows are remapped through the id translation.
  Duplicates against existing active landmarks are cleaned up by the
  regular fuse_duplicate_landmarks pass at subsequent keyframes.

The host policy (when to freeze, when to attempt a weld) lives in
models/system.py — decisions from a handful of scalars, math on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import TrackingConfig
from send_slam_tpu.models.map_state import MapState
from send_slam_tpu.models.sim3_solver import Sim3Result, sim3_ransac
from send_slam_tpu.ops.hamming import match_descriptors


def best_cross_map_candidate(
    frozen: MapState, query_signature: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best retrieval hit of a query frame signature against a frozen
    map's keyframe database. Returns (kf_id, score)."""
    scores = jnp.where(frozen.kf_valid, frozen.kf_signature
                       @ query_signature, -1.0)
    best = jnp.argmax(scores).astype(jnp.int32)
    return best, scores[best]


class CrossMapSim3(NamedTuple):
    ok: jnp.ndarray
    n_matches: jnp.ndarray
    sim3: Sim3Result        # active-world <- frozen-world


def cross_map_sim3(
    active: MapState, frozen: MapState,
    active_kf: jnp.ndarray, frozen_kf: jnp.ndarray,
    key: jnp.ndarray, cfg: TrackingConfig,
    min_matches: int = 12,
) -> CrossMapSim3:
    """Estimate S_af (maps frozen-world points into the active world)
    from descriptor matches between one keyframe of each map."""
    desc_a = active.kf_desc[active_kf]
    desc_f = frozen.kf_desc[frozen_kf]
    valid_a = active.kf_kp_valid[active_kf] \
        & (active.kf_obs_lm[active_kf] >= 0)
    valid_f = frozen.kf_kp_valid[frozen_kf] \
        & (frozen.kf_obs_lm[frozen_kf] >= 0)

    match = match_descriptors(desc_a, desc_f, valid_a, valid_f,
                              max_dist=float(cfg.hamming_th_low),
                              ratio=1e9, mutual=True)
    N = desc_a.shape[0]
    idx_f = jnp.clip(match.idx, 0, N - 1)
    lm_a = active.kf_obs_lm[active_kf]
    lm_f = frozen.kf_obs_lm[frozen_kf][idx_f]
    pair_ok = match.valid & (lm_a >= 0) & (lm_f >= 0)

    Xa = active.lm_pos[jnp.clip(lm_a, 0, active.max_landmarks - 1)]
    Xf = frozen.lm_pos[jnp.clip(lm_f, 0, frozen.max_landmarks - 1)]

    # Umeyama source = frozen cloud, target = active cloud.
    res = sim3_ransac(Xf, Xa, pair_ok, key)
    n_matches = jnp.sum(pair_ok)
    ok = res.ok & (n_matches >= min_matches)
    return CrossMapSim3(ok=ok, n_matches=n_matches, sim3=res)


def weld_maps(
    active: MapState, frozen: MapState,
    s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
) -> Tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Import the frozen map into the active one under x_a = s·R·x_f + t.

    Returns (map, n_kf_imported, n_lm_imported). Imports are capacity-
    gated: frozen keyframes fill the slots after active.n_kf (newest-
    first priority is NOT applied — the frozen chain keeps its order so
    chain edges inside the segment stay meaningful); frozen landmarks
    take free landmark slots, most-observed first."""
    MK, ML, N = active.max_keyframes, active.max_landmarks, \
        active.n_keypoints
    ids = jnp.arange(MK, dtype=jnp.int32)

    # ---- landmark id translation -------------------------------------
    f_lm_valid = frozen.lm_valid
    # Priority: most-found frozen landmarks get slots first when space
    # is short. rank within frozen valid by -found.
    order_key = jnp.where(f_lm_valid, -frozen.lm_found, 1 << 30)
    order = jnp.argsort(order_key)                       # (ML,) frozen ids
    # free active slots, in order.
    free = ~active.lm_valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1   # active slot rank
    n_free = jnp.sum(free.astype(jnp.int32))
    slot_of_rank = jnp.full((ML,), ML, jnp.int32).at[
        jnp.where(free, free_rank, ML)].set(
        jnp.arange(ML, dtype=jnp.int32), mode="drop")
    # frozen id -> import rank
    imp_rank = jnp.full((ML,), ML, jnp.int32).at[order].set(
        jnp.arange(ML, dtype=jnp.int32))
    takes = f_lm_valid & (imp_rank < n_free)
    remap = jnp.where(
        takes, slot_of_rank[jnp.clip(imp_rank, 0, ML - 1)], ML)  # (ML,)

    # Transformed positions.
    Xa = (s * (frozen.lm_pos @ R.T)) + t[None]

    def lm_scatter(dst, src, fill_idx=remap):
        return dst.at[fill_idx].set(src, mode="drop")

    lm_pos = lm_scatter(active.lm_pos, Xa)
    lm_desc = lm_scatter(active.lm_desc, frozen.lm_desc)
    lm_valid = active.lm_valid.at[remap].set(True, mode="drop")
    lm_visible = lm_scatter(active.lm_visible, frozen.lm_visible)
    lm_found = lm_scatter(active.lm_found, frozen.lm_found)
    # Viewing normals rotate; distances scale by s.
    lm_normal = lm_scatter(active.lm_normal, frozen.lm_normal @ R.T)
    lm_dmin = lm_scatter(active.lm_dist_min, frozen.lm_dist_min * s)
    lm_dmax = lm_scatter(active.lm_dist_max, frozen.lm_dist_max * s)
    lm_votes = lm_scatter(active.lm_bit_votes, frozen.lm_bit_votes)
    lm_vcnt = lm_scatter(active.lm_vote_count, frozen.lm_vote_count)

    # ---- keyframe import ----------------------------------------------
    f_kf_valid = frozen.kf_valid & (ids < frozen.n_kf)
    f_rank = jnp.cumsum(f_kf_valid.astype(jnp.int32)) - 1
    space = MK - active.n_kf
    kf_takes = f_kf_valid & (f_rank < space)
    dst_slot = jnp.where(kf_takes, active.n_kf + f_rank, MK)  # (MK,)
    n_kf_imp = jnp.sum(kf_takes.astype(jnp.int32))

    # Sim3-corrected SE3 poses: T_cw_a = T_cw_f ∘ S_fa, scale folded
    # into translation (the loop-closing convention).
    R_new = frozen.kf_R @ R.T                      # (MK,3,3)
    t_new = s * frozen.kf_t - jnp.einsum('kij,j->ki', R_new, t)

    # Observation rows remap through the landmark translation; frozen
    # landmarks that did not fit lose their observations.
    f_obs = frozen.kf_obs_lm                       # (MK,N)
    f_obs_new = jnp.where(
        f_obs >= 0, remap[jnp.clip(f_obs, 0, ML - 1)], -1)
    f_obs_new = jnp.where(f_obs_new >= ML, -1, f_obs_new)

    # lm_ref_kf for imported landmarks: their frozen ref keyframe's new
    # slot (or -1 if that keyframe did not fit).
    f_ref = frozen.lm_ref_kf
    ref_slot = jnp.where(
        (f_ref >= 0) & kf_takes[jnp.clip(f_ref, 0, MK - 1)],
        dst_slot[jnp.clip(f_ref, 0, MK - 1)], -1)
    lm_ref = active.lm_ref_kf.at[remap].set(ref_slot, mode="drop")

    def kf_scatter(dst, src, fill=None):
        out = dst.at[dst_slot].set(src, mode="drop")
        return out

    # The first imported keyframe starts a new chain segment.
    first_imp = (f_rank == 0) & kf_takes
    cb = frozen.kf_chain_break | first_imp

    m = active._replace(
        kf_R=kf_scatter(active.kf_R, R_new),
        kf_t=kf_scatter(active.kf_t, t_new),
        kf_timestamp=kf_scatter(active.kf_timestamp, frozen.kf_timestamp),
        kf_valid=active.kf_valid.at[dst_slot].set(True, mode="drop"),
        kf_uv=kf_scatter(active.kf_uv, frozen.kf_uv),
        kf_desc=kf_scatter(active.kf_desc, frozen.kf_desc),
        kf_octave=kf_scatter(active.kf_octave, frozen.kf_octave),
        kf_kp_valid=kf_scatter(active.kf_kp_valid, frozen.kf_kp_valid),
        kf_obs_lm=kf_scatter(active.kf_obs_lm, f_obs_new),
        kf_signature=kf_scatter(active.kf_signature, frozen.kf_signature),
        kf_chain_break=kf_scatter(active.kf_chain_break, cb),
        lm_pos=lm_pos, lm_desc=lm_desc, lm_valid=lm_valid,
        lm_ref_kf=lm_ref, lm_visible=lm_visible, lm_found=lm_found,
        lm_normal=lm_normal, lm_dist_min=lm_dmin, lm_dist_max=lm_dmax,
        lm_bit_votes=lm_votes, lm_vote_count=lm_vcnt,
        n_kf=active.n_kf + n_kf_imp,
    )
    n_lm_imp = jnp.sum((remap < ML).astype(jnp.int32))
    return m, n_kf_imp, n_lm_imp
