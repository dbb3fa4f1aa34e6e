"""Cross-camera shared-map merge (BASELINE.json config 5).

Each camera lane builds its own map in its own (monocular-gauge) frame.
Merging maps across lanes therefore needs, per pair of cameras:

1. descriptor-matched landmark correspondences (the cameras co-observe
   scene content),
2. a Sim(3) alignment between the two landmark clouds
   (models/sim3_solver — scale differs between monocular maps!),
3. import of the partner's landmarks transformed into my frame, with
   3-D/descriptor dedup against my table.

Communication: ONE all_gather of (lm_pos, lm_desc, lm_valid) over the
"cam" mesh axis; all alignment math runs redundantly per lane (SPMD) —
cheaper than orchestrating point-to-point exchanges at this size.
Ring topology: lane i merges from lane (i+1) % n each call; repeated
calls circulate the whole fleet's content.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from send_slam_tpu.config import TrackingConfig
from send_slam_tpu.models.map_state import MapState, add_landmarks
from send_slam_tpu.models.sim3_solver import sim3_ransac
from send_slam_tpu.ops.hamming import match_descriptors


def merge_from_partner(
    m: MapState,
    partner_pos: jnp.ndarray,    # (ML,3) partner landmarks (their frame)
    partner_desc: jnp.ndarray,   # (ML,8)
    partner_valid: jnp.ndarray,  # (ML,)
    key: jnp.ndarray,
    cfg: TrackingConfig,
    max_import: int = 512,
    dedup_dist: float = 0.05,    # relative to scene scale (see sim3_ransac)
    trust_radius: float = 3.0,   # x support RMS radius (see below)
) -> Tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Align the partner's map to mine (Sim3 over co-observed
    landmarks) and import its novel landmarks. Returns
    (map, aligned_ok, n_imported). Fully jittable / shard_map-safe:
    when alignment fails nothing is imported (masked adds)."""
    ML = m.max_landmarks

    # 1. Correspondences by descriptor (tight threshold, mutual).
    match = match_descriptors(
        m.lm_desc, partner_desc, m.lm_valid, partner_valid,
        max_dist=float(cfg.hamming_th_low), ratio=0.8, mutual=True)
    idx = jnp.clip(match.idx, 0, ML - 1)
    src = partner_pos[idx]                      # partner frame
    dst = m.lm_pos                              # my frame
    res = sim3_ransac(src, dst, match.valid, key)

    # 2. Transform the partner cloud into my frame.
    aligned = res.s * (partner_pos @ res.R.T) + res.t

    # 3. Novelty test: import only landmarks without a 3-D-near,
    # descriptor-near counterpart in my map. Scene scale for the
    # distance gate mirrors sim3_ransac's relative threshold.
    my_valid_f = m.lm_valid.astype(jnp.float32)
    center = jnp.sum(m.lm_pos * my_valid_f[:, None], 0) / \
        jnp.maximum(jnp.sum(my_valid_f), 1.0)
    scene = jnp.sqrt(jnp.sum(
        jnp.where(m.lm_valid[:, None], (m.lm_pos - center) ** 2, 0.0))
        / jnp.maximum(jnp.sum(my_valid_f), 1.0))
    th = dedup_dist * jnp.maximum(scene, 1e-6)

    # Nearest 3-D distance of each partner landmark to my table.
    d2 = jnp.sum((aligned[:, None, :] - m.lm_pos[None, :, :]) ** 2, -1)
    d2 = jnp.where(m.lm_valid[None, :], d2, jnp.inf)
    nearest = jnp.sqrt(jnp.min(d2, axis=1))

    # Trust region: the Sim3 is determined by the co-observed inlier
    # cluster; its gauge error AMPLIFIES with distance from that
    # cluster (a 1% scale error moves a landmark 10 support-radii out
    # by 10% of the cluster extent — measured: one 8-lane merge landed
    # an extrapolated import 5.5 m off true structure while the
    # co-observed region aligned fine). Import only partner landmarks
    # within trust_radius x the support RMS radius; a degenerate tight
    # support cluster then self-limits how far it can pollute the map.
    wi = (res.inlier & match.valid).astype(jnp.float32)
    wi_sum = jnp.maximum(jnp.sum(wi), 1.0)
    c_sup = jnp.sum(src * wi[:, None], 0) / wi_sum      # partner frame
    r_sup = jnp.sqrt(jnp.sum(wi * jnp.sum((src - c_sup) ** 2, -1))
                     / wi_sum)
    d_sup = jnp.linalg.norm(partner_pos - c_sup, axis=-1)
    near_support = d_sup <= trust_radius * jnp.maximum(r_sup, 1e-6)

    novel = partner_valid & (nearest > th) & res.ok & near_support

    # Cap the import count: keep the first max_import novel rows.
    order = jnp.cumsum(novel.astype(jnp.int32))
    pick = novel & (order <= max_import)

    m, lm_ids = add_landmarks(
        m, aligned, partner_desc, pick,
        ref_kf=jnp.asarray(-1, jnp.int32),
        kf_a=jnp.asarray(0, jnp.int32),
        kp_idx_a=jnp.full((ML,), m.n_keypoints, jnp.int32),  # no obs
        kf_b=jnp.asarray(0, jnp.int32),
        kp_idx_b=jnp.full((ML,), m.n_keypoints, jnp.int32))
    return m, res.ok, jnp.sum((lm_ids >= 0).astype(jnp.int32))


def multicam_merge_step(cfg, mesh):
    """Build the jitted sharded merge: each lane aligns with + imports
    from its ring neighbour over one all_gather."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    tr = cfg.tracking

    def sharded(maps: MapState, keys):
        # Local block: (L, ...) — the lanes on THIS device. L is 1 on
        # a lane-per-chip pod and n_lanes on a single chip (the shard
        # body must not assume lanes == devices: the original
        # maps[0]-only body silently merged lane 0 with itself and
        # DROPPED lanes 1..7 on a 1-device TPU mesh — caught by the
        # round-5 real-chip lane run). tiled all_gathers give every
        # device the full (n_total, ...) fleet; each local lane k
        # merges with its GLOBAL ring successor.
        all_pos = jax.lax.all_gather(maps.lm_pos, "cam", tiled=True)
        all_desc = jax.lax.all_gather(maps.lm_desc, "cam", tiled=True)
        all_valid = jax.lax.all_gather(maps.lm_valid, "cam", tiled=True)
        n = all_valid.shape[0]
        L = maps.lm_valid.shape[0]
        base = jax.lax.axis_index("cam") * L

        def one(k, key):
            me = jax.tree.map(lambda x: x[k], maps)
            j = (base + k + 1) % n
            return merge_from_partner(
                me, all_pos[j], all_desc[j], all_valid[j], key, tr)

        return jax.vmap(one)(jnp.arange(L), keys)

    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(P("cam"), P("cam")),
        out_specs=(P("cam"), P("cam"), P("cam")),
        check_vma=False)
    return jax.jit(fn)
