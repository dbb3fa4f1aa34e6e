"""ORB feature extraction: spatially-uniform keypoints, IC-angle
orientation, rotated-BRIEF 256-bit descriptors.

TPU-native re-design of ORB-SLAM3's ORBextractor
(slam_backends/orb_slam_3/CMakeLists.txt:52; parameters injected by the
reference adapter at orbslam3_mono_networked.cc:193-206: nFeatures 1250,
scaleFactor 1.2, nLevels 8, iniThFAST 20, minThFAST 7):

- Dense FAST score maps per pyramid level (ops/fast.py) instead of
  per-cell cv::FAST: the quadtree keypoint distribution becomes a
  grid-cell masked top-k — fixed capacity, no data-dependent shapes.
- The per-cell iniThFAST→minThFAST fallback becomes a vectorized
  per-cell select between two dense score maps.
- The descriptor pattern is our own seeded Gaussian-pair pattern (the
  BRIEF construction from the ORB paper), NOT OpenCV's learned table —
  descriptors are self-consistent within this engine, which is all
  matching/retrieval needs.

Outputs are fixed-capacity arrays with validity masks (the static-shape
contract everything downstream relies on).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.config import OrbConfig
from send_slam_tpu.ops.fast import fast_score_map, nms3x3
from send_slam_tpu.ops.pyramid import build_pyramid, gaussian_blur


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    import os
    if os.environ.get("SLAM_FORCE_CPU_PATHS") == "1":
        # Diagnostic: run the exact scatter/gather formulations on the
        # TPU (slow — serial lowering) to isolate one-hot bf16 path
        # numerics from other backend differences.
        return False
    try:
        return "tpu" in jax.devices()[0].platform.lower() or \
            "tpu" in str(jax.devices()[0].device_kind).lower()
    except Exception:
        return False


def _fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dispatch: fused Pallas kernel on TPU, jnp reference elsewhere."""
    if _on_tpu():
        from send_slam_tpu.ops.pallas.fast_kernel import fast_score_map_pallas
        return fast_score_map_pallas(img, threshold)
    return fast_score_map(img, threshold)


def _fast_nms_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST score + 3x3 NMS, fused into one Pallas pass on TPU."""
    if _on_tpu():
        from send_slam_tpu.ops.pallas.fast_kernel import fast_score_map_pallas
        return fast_score_map_pallas(img, threshold, with_nms=True)
    return nms3x3(fast_score_map(img, threshold))

PATCH_R = 15           # orientation patch radius (31x31)
DESC_R = 16            # descriptor gather radius (33x33)
DESC_PATCH = 2 * DESC_R + 1


class FrameFeatures(NamedTuple):
    """Fixed-capacity ORB features for one frame (a pytree of arrays).

    The TPU-native analogue of ORB-SLAM3's Frame keypoint storage
    (CMakeLists.txt:62): struct-of-arrays, padded to ``capacity`` with
    ``valid`` masking the live entries.
    """

    uv: jnp.ndarray        # (N, 2) float32 — level-0 pixel coords (x, y)
    response: jnp.ndarray  # (N,) float32 — FAST score
    octave: jnp.ndarray    # (N,) int32 — pyramid level
    angle: jnp.ndarray     # (N,) float32 — orientation, radians
    desc: jnp.ndarray      # (N, 8) uint32 — packed 256-bit descriptors
    valid: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


# ---------------------------------------------------------------------------
# BRIEF pattern


@functools.lru_cache(maxsize=None)
def brief_pattern(n_bits: int = 256, seed: int = 20260816) -> np.ndarray:
    """(n_bits, 4) int8: (x1, y1, x2, y2) sampling-pair offsets.

    BRIEF-style Gaussian pairs (ORB paper Sec. 4.1: p, q ~ N(0, S^2/25)
    with S=31), clipped to radius 13 so any rotation stays inside the
    33x33 gather patch. Seeded: the pattern is a constant of the
    engine — descriptors are stable across runs/checkpoints.
    """
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 4))
    r = 13.0
    pts = np.clip(pts, -r, r)
    # Avoid degenerate pairs (identical points compare to 0 always).
    for i in range(n_bits):
        while np.all(np.round(pts[i, :2]) == np.round(pts[i, 2:])):
            pts[i] = np.clip(rng.normal(0.0, sigma, size=4), -r, r)
    return np.round(pts).astype(np.int8)


# ---------------------------------------------------------------------------
# Keypoint selection


def _grid_topk(
    score: jnp.ndarray,
    score_fallback: jnp.ndarray,
    n_keep: int,
    grid_cells: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spatially-uniform masked top-k over a score map.

    The grid replaces ORB-SLAM3's quadtree (DistributeOctTree): each of
    ``grid_cells^2`` cells contributes at most ``cap`` keypoints (cap =
    2x the even share), then a global masked top-k keeps ``n_keep``.
    Cells empty at the primary threshold fall back to the low-threshold
    score map (the iniThFAST -> minThFAST retry, vectorized).

    Returns (uv int32 (n_keep, 2) as (x, y), score (n_keep,), valid).
    """
    H, W = score.shape
    G = grid_cells
    Hp = -(-H // G) * G
    Wp = -(-W // G) * G
    pad = ((0, Hp - H), (0, Wp - W))
    s_hi = jnp.pad(score, pad)
    s_lo = jnp.pad(score_fallback, pad)
    ch, cw = Hp // G, Wp // G

    def to_cells(s):
        return s.reshape(G, ch, G, cw).transpose(0, 2, 1, 3).reshape(G * G, ch * cw)

    cells_hi = to_cells(s_hi)
    cells_lo = to_cells(s_lo)
    has_hi = jnp.max(cells_hi, axis=1, keepdims=True) > 0
    cells = jnp.where(has_hi, cells_hi, cells_lo)

    cap = max(1, min(2 * (-(-n_keep // (G * G))), ch * cw))
    vals, idx = jax.lax.top_k(cells, cap)          # (G*G, cap)

    # Cell-local flat idx -> global (x, y).
    cy = idx // cw
    cx = idx % cw
    cell_ids = jnp.arange(G * G, dtype=jnp.int32)[:, None]
    gy = (cell_ids // G) * ch + cy
    gx = (cell_ids % G) * cw + cx

    flat_vals = vals.reshape(-1)
    flat_x = gx.reshape(-1)
    flat_y = gy.reshape(-1)

    top_vals, top_i = jax.lax.top_k(flat_vals, n_keep)
    uv = jnp.stack([flat_x[top_i], flat_y[top_i]], -1)
    valid = top_vals > 0
    return uv, top_vals, valid


def _subpixel_offsets(raw_score: jnp.ndarray,
                      uv: jnp.ndarray) -> jnp.ndarray:
    """(K, 2) float32 sub-pixel corner offsets in [-0.5, 0.5].

    Separable 3-point parabola fit on the PRE-NMS FAST score map around
    each integer corner (the NMS'd map has zeroed neighbours and cannot
    be fit). Integer keypoint quantization is ~0.3 px of measurement
    noise that triangulation amplifies by z^2/(f*b) into map depth error
    — on low-texture or quantized (uint8) imagery this is a dominant
    drift term (bench-scenario ATE 0.32 -> 0.03 on CPU). ORB-SLAM3
    keeps integer FAST corners; this is a deliberate accuracy
    improvement, not a parity feature.

    Numerics: the fit runs as DENSE elementwise maps in exact f32
    (shifted slices), and only the bounded [-0.5, 0.5] offset VALUES go
    through the bf16 one-hot gather (<= 2^-9 absolute error, ~0.002
    px). Gathering raw 3x3 score neighbourhoods instead and fitting
    after would round the scores themselves to bf16 on TPU (~1 unit at
    score ~128) — neighbour differences are a few units, so the fit
    would come back garbage there while staying exact on CPU."""
    p = jnp.pad(raw_score, 1)
    s0 = raw_score
    sxm, sxp = p[1:-1, :-2], p[1:-1, 2:]
    sym, syp = p[:-2, 1:-1], p[2:, 1:-1]

    def axis_offset(sm, s0_, sp):
        denom = sm - 2.0 * s0_ + sp                   # <= 0 at a peak
        off = jnp.where(jnp.abs(denom) > 1e-6,
                        0.5 * (sm - sp) / denom, 0.0)
        # Fit trusts only a genuine local max: clamp into the NMS cell.
        return jnp.clip(off, -0.5, 0.5)

    dx_map = axis_offset(sxm, s0, sxp)
    dy_map = axis_offset(sym, s0, syp)
    dx = _gather_patches(dx_map, uv, 0)[:, 0, 0]
    dy = _gather_patches(dy_map, uv, 0)[:, 0, 0]
    return jnp.stack([dx, dy], -1)


# ---------------------------------------------------------------------------
# Patch gathering, orientation, descriptors


def _gather_patches(img: jnp.ndarray, uv: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather (2r+1)^2 patches at integer centers. uv: (K, 2) int32
    (x, y), assumed >= radius from the border (selection enforces the
    ORB edge_threshold margin; invalid slots are clamped).

    On TPU the general gather lowers to a serial per-element loop
    (measured ~16 ms for 1250x33x33 at 640x480) — so the gather is
    expressed as two one-hot matmuls on the MXU instead (~3 ms for the
    same shape): patch = P_y @ img @ P_x^T per keypoint, with P_y/P_x
    exact {0,1} bf16 selection matrices. Pixel values round to bf16
    (<=0.5 intensity level), noise the 256-bit descriptor absorbs.

    The CPU path applies the SAME bf16 value rounding before its exact
    gather: a one-hot bf16 matmul returns exactly bf16(pixel) (single
    nonzero per row — no accumulation), so rounding on CPU makes the
    gathered patches BIT-IDENTICAL across backends. Everything
    downstream of the patches (IC angle, BRIEF bits, subpixel offsets)
    then consumes identical inputs — descriptor parity is what keeps
    the two backends in the same KF-cascade basin (CLAUDE.md round-3).
    """
    H, W = img.shape
    r = radius
    x = jnp.clip(uv[:, 0], r, W - 1 - r)
    y = jnp.clip(uv[:, 1], r, H - 1 - r)
    d = jnp.arange(-r, r + 1)
    if _on_tpu():
        ry = y[:, None] + d[None, :]                   # (K, P)
        rx = x[:, None] + d[None, :]
        Py = (ry[..., None] == jnp.arange(H)[None, None, :]) \
            .astype(jnp.bfloat16)                      # (K, P, H)
        Px = (rx[..., None] == jnp.arange(W)[None, None, :]) \
            .astype(jnp.bfloat16)                      # (K, P, W)
        rows = jnp.einsum('kph,hw->kpw', Py, img.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return jnp.einsum('kpw,kqw->kpq', rows.astype(jnp.bfloat16), Px,
                          preferred_element_type=jnp.float32)
    yy = y[:, None, None] + d[None, :, None]           # (K, P, 1)
    xx = x[:, None, None] + d[None, None, :]           # (K, 1, P)
    vals = img.astype(jnp.bfloat16).astype(jnp.float32)
    return vals[yy, xx]                                # (K, P, P)


@functools.lru_cache(maxsize=None)
def _ic_angle_weights(radius: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Circular-patch moment weights: mask, x-weights, y-weights."""
    d = np.arange(-radius, radius + 1)
    xx, yy = np.meshgrid(d, d)
    # Discrete circle: row v spans |u| <= round(sqrt(r^2 - v^2)) — the
    # same shape as OpenCV's u_max table up to boundary rounding.
    umax = np.round(np.sqrt(np.maximum(radius * radius - d * d, 0)))
    mask = np.abs(xx) <= umax[:, None]
    return mask, (xx * mask), (yy * mask)


def ic_angle(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint (radians)."""
    patches = _gather_patches(img, uv, PATCH_R)    # (K, 31, 31)
    return ic_angle_from_patches(patches)


@functools.lru_cache(maxsize=None)
def _ic_moment_matrix(patch_size: int) -> np.ndarray:
    """(patch_size^2, 2) f32: columns are the x- and y-moment weights of
    the centered 31x31 circular window, zero-padded to the patch."""
    r = (patch_size - 1) // 2
    off = r - PATCH_R
    _, wx, wy = _ic_angle_weights(PATCH_R)
    Wx = np.zeros((patch_size, patch_size), np.float32)
    Wy = np.zeros((patch_size, patch_size), np.float32)
    Wx[off:off + 2 * PATCH_R + 1, off:off + 2 * PATCH_R + 1] = wx
    Wy[off:off + 2 * PATCH_R + 1, off:off + 2 * PATCH_R + 1] = wy
    return np.stack([Wx.reshape(-1), Wy.reshape(-1)], -1)


def ic_angle_from_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """IC angle from pre-gathered patches; uses the centered 31x31
    window of whatever radius the patches carry. One (K, P^2) @ (P^2, 2)
    matmul — the broadcast-multiply-reduce form costs ~4 ms on TPU for
    the same work, the MXU form is noise."""
    K, P = patches.shape[0], patches.shape[1]
    Wm = jnp.asarray(_ic_moment_matrix(P))
    m = patches.reshape(K, P * P) @ Wm                   # (K, 2)
    return jnp.arctan2(m[:, 1], m[:, 0])


def brief_descriptors(
    blurred: jnp.ndarray, uv: jnp.ndarray, angle: jnp.ndarray,
) -> jnp.ndarray:
    """Rotated-BRIEF: (K, 8) uint32 packed descriptors."""
    patches = _gather_patches(blurred, uv, DESC_R)   # (K, 33, 33)
    return brief_from_patches(patches, angle)


N_ANGLE_BINS = 32      # 11.25 deg — OpenCV ORB quantizes to 12 deg


@functools.lru_cache(maxsize=None)
def _binned_pattern_indices() -> np.ndarray:
    """(B, 512) int32: flat patch indices of the BRIEF sample points
    for each quantized orientation — columns 0..255 are the first pair
    endpoints, 256..511 the second. Precomputing per-bin rotated
    patterns (OpenCV ORB does exactly this at 12 deg granularity)
    replaces the per-keypoint rotate + take_along_axis, which lowers to
    a serial gather on TPU."""
    pat = brief_pattern().astype(np.float64)          # (256, 4)
    out = np.zeros((N_ANGLE_BINS, 512), np.int32)
    for b in range(N_ANGLE_BINS):
        a = 2.0 * np.pi * b / N_ANGLE_BINS
        ca, sa = np.cos(a), np.sin(a)
        for half, (px, py) in enumerate([(pat[:, 0], pat[:, 1]),
                                         (pat[:, 2], pat[:, 3])]):
            # Pattern coords are per-axis clipped to 13, so a rotated
            # corner point can reach 13*sqrt(2) > DESC_R: clamp to the
            # patch (the old per-keypoint rotate relied on the XLA
            # gather clamp for the same cases).
            rx = np.clip(np.round(px * ca - py * sa), -DESC_R, DESC_R)
            ry = np.clip(np.round(px * sa + py * ca), -DESC_R, DESC_R)
            out[b, half * 256:(half + 1) * 256] = \
                ((ry + DESC_R) * DESC_PATCH + (rx + DESC_R)).astype(np.int64)
    return out


@functools.lru_cache(maxsize=None)
def _binned_sampling_matrix() -> np.ndarray:
    """(33*33, B*512) f32 one-hot: column b*512+s selects bin b's
    sample point s from a flattened patch (the MXU form of the BRIEF
    sampling gather)."""
    idx = _binned_pattern_indices()                   # (B, 512)
    S = np.zeros((DESC_PATCH * DESC_PATCH,
                  N_ANGLE_BINS * 512), np.float32)
    cols = np.arange(N_ANGLE_BINS * 512)
    S[idx.reshape(-1), cols] = 1.0
    return S


def brief_from_patches(patches: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated-BRIEF from pre-gathered (K, 33, 33) blurred patches.

    The orientation is quantized to N_ANGLE_BINS (like OpenCV ORB's
    12-degree factor table) and the per-bin sample positions are
    precomputed. On TPU the sampling runs as ONE (K, 1089) @ (1089,
    B*512) bf16 matmul + a bin one-hot contraction (general gathers
    serialize there); elsewhere it is a take_along_axis row gather."""
    K = patches.shape[0]
    flat = patches.reshape(K, -1)                     # (K, 1089)
    two_pi = 2.0 * jnp.pi
    frac = (angle / two_pi) * N_ANGLE_BINS
    bins = jnp.round(frac).astype(jnp.int32) % N_ANGLE_BINS  # (K,)

    if _on_tpu():
        S = jnp.asarray(_binned_sampling_matrix(), jnp.bfloat16)
        samples_all = jax.lax.dot_general(
            flat.astype(jnp.bfloat16), S,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (K, B*512)
        samples_all = samples_all.reshape(K, N_ANGLE_BINS, 512)
        onehot = (bins[:, None]
                  == jnp.arange(N_ANGLE_BINS)[None, :]).astype(jnp.float32)
        sel = jnp.einsum('kbs,kb->ks', samples_all, onehot)  # (K, 512)
    else:
        idx = jnp.asarray(_binned_pattern_indices())  # (B, 512)
        sel = jnp.take_along_axis(flat, idx[bins], axis=1)

    bits = sel[:, :256] < sel[:, 256:]                # (K, 256) bool
    return pack_bits(bits)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(K, 256) bool -> (K, 8) uint32, little-endian bit order per word."""
    K = bits.shape[0]
    b = bits.reshape(K, 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(b * weights, axis=2, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Full extraction


def extract_orb(img: jnp.ndarray, cfg: OrbConfig) -> FrameFeatures:
    """(H, W) float32 grayscale -> FrameFeatures with capacity
    cfg.n_features. Jit-compatible; all shapes static given (H, W, cfg).
    """
    levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = cfg.per_level_features
    border = cfg.edge_threshold

    parts: List[FrameFeatures] = []
    for lvl, (level_img, n_lvl) in enumerate(zip(levels, budgets)):
        H, W = level_img.shape
        # One FAST pass: the score equals the largest threshold at
        # which the arc-9 test still passes, so the iniThFAST map is a
        # re-threshold of the minThFAST map (corner(t) <=> score > t).
        raw = _fast_score(level_img, float(cfg.min_th_fast))
        s_lo = nms3x3(raw)
        s_hi = jnp.where(s_lo > float(cfg.ini_th_fast), s_lo, 0.0)

        # Border mask: the ORB edge_threshold margin guarantees the
        # orientation/descriptor patches stay in bounds.
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        inb = ((ys >= border) & (ys < H - border)
               & (xs >= border) & (xs < W - border))
        s_hi = jnp.where(inb, s_hi, 0.0)
        s_lo = jnp.where(inb, s_lo, 0.0)

        uv_l, resp, valid = _grid_topk(s_hi, s_lo, n_lvl, cfg.grid_cells)

        # ONE patch gather (33x33 from the blurred image) feeds both the
        # IC-angle moments and the BRIEF sampling — per-keypoint gathers
        # are the extraction's cost center on TPU.
        blurred = gaussian_blur(level_img, sigma=2.0, ksize=7)
        patches = _gather_patches(blurred, uv_l, DESC_R)
        angle = ic_angle_from_patches(patches)
        desc = brief_from_patches(patches, angle)

        scale = cfg.scale_factor ** lvl
        uvf = uv_l.astype(jnp.float32)
        if cfg.subpixel:
            uvf = uvf + _subpixel_offsets(raw, uv_l)
        # Half-pixel convention: level-L pixel centers sit at level-0
        # coordinate (x + 0.5) * scale**L - 0.5 (the bilinear resample's
        # affine maps telescope exactly — see build_pyramid). The naive
        # uvf * scale biases upper-octave keypoints toward the origin
        # by 0.5 * (scale**L - 1) px — 1.3 px at level 7. ORB-SLAM3
        # inherits the same bias from cv::resize; like subpixel, this
        # is a deliberate accuracy fix, not a parity break.
        uv0 = (uvf + 0.5) * scale - 0.5
        parts.append(FrameFeatures(
            uv=uv0,
            response=resp,
            octave=jnp.full((n_lvl,), lvl, jnp.int32),
            angle=angle,
            desc=desc,
            valid=valid,
        ))

    return FrameFeatures(
        uv=jnp.concatenate([p.uv for p in parts]),
        response=jnp.concatenate([p.response for p in parts]),
        octave=jnp.concatenate([p.octave for p in parts]),
        angle=jnp.concatenate([p.angle for p in parts]),
        desc=jnp.concatenate([p.desc for p in parts]),
        valid=jnp.concatenate([p.valid for p in parts]),
    )
