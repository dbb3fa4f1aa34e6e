"""FAST-16 corner detection as dense vectorized VPU work.

TPU-native replacement for ORB-SLAM3's per-cell cv::FAST calls
(ORBextractor::ComputeKeyPointsOctTree, CMakeLists.txt:52). Instead of
branchy per-pixel early-outs, the whole image is tested at once:

- 16 shifted views of the padded image give the Bresenham circle.
- "brighter"/"darker" flags pack into 16-bit masks; a contiguous run of
  >= 9 flags is detected branch-free by doubling the mask into 32 bits
  and AND-shifting (runs of 2 -> 4 -> 8, then & (m >> 8) for 9).
- The corner score is OpenCV's: max over the 16 arcs of the min
  absolute center difference along 9 consecutive circle pixels.

Everything is elementwise int32/float32 over (H, W) — ideal VPU shape,
and the jnp path fuses into a handful of XLA ops. A Pallas version
(ops/pallas/fast_kernel.py) tiles the same math explicitly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Bresenham circle radius 3, OpenCV pixel order (clockwise from top).
CIRCLE_OFFSETS: Tuple[Tuple[int, int], ...] = (
    (0, -3), (1, -3), (2, -2), (3, -1),
    (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)  # (dx, dy)


def _circle_views(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (16, H, W): the 16 circle neighbours of every pixel.

    Border pixels read replicated padding; callers mask a >=3 px border
    (the ORB edge_threshold margin is far larger anyway).
    """
    H, W = img.shape
    p = jnp.pad(img, 3, mode="edge")
    views = [p[3 + dy: 3 + dy + H, 3 + dx: 3 + dx + W] for dx, dy in CIRCLE_OFFSETS]
    return jnp.stack(views)


def _has_run9(mask16: jnp.ndarray) -> jnp.ndarray:
    """mask16: int32 (…,) with 16 valid bits -> bool: any circular run >= 9."""
    m = mask16 | (mask16 << 16)          # circular wrap in 32 bits
    r2 = m & (m >> 1)                    # runs >= 2
    r4 = r2 & (r2 >> 2)                  # runs >= 4
    r8 = r4 & (r4 >> 4)                  # runs >= 8
    r9 = r8 & (m >> 8)                   # runs >= 9
    return (r9 & 0xFFFF) != 0


def fast_score_map(
    img: jnp.ndarray, threshold: float,
) -> jnp.ndarray:
    """Dense FAST-16 score map.

    img: (H, W) float32 intensities.
    Returns (H, W) float32: OpenCV-style corner score where the arc-9
    corner test passes, 0 elsewhere.
    """
    d = _circle_views(img) - img[None]           # (16, H, W)
    bright = (d > threshold).astype(jnp.int32)
    dark = (d < -threshold).astype(jnp.int32)

    weights = jnp.asarray([1 << i for i in range(16)], jnp.int32)
    bright_mask = jnp.tensordot(weights, bright, axes=([0], [0]))
    dark_mask = jnp.tensordot(weights, dark, axes=([0], [0]))
    is_corner = _has_run9(bright_mask) | _has_run9(dark_mask)

    # Score: max over arc start s of min_{k<9} d[(s+k) % 16]  (bright),
    # and likewise for -d (dark). Implemented with static rolls.
    def arc9_score(x):
        # x: (16, H, W); running min over 9 consecutive circle entries.
        m = x
        m = jnp.minimum(m, jnp.roll(x, -1, 0))
        m2 = jnp.minimum(m, jnp.roll(m, -2, 0))          # min of 4
        m4 = jnp.minimum(m2, jnp.roll(m2, -4, 0))        # min of 8
        m8 = jnp.minimum(m4, jnp.roll(x, -8, 0))         # min of 9
        return jnp.max(m8, axis=0)

    score = jnp.maximum(arc9_score(d), arc9_score(-d))
    return jnp.where(is_corner, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only 3x3 local maxima (ties broken towards earlier pixels
    by strict comparison on later neighbours)."""
    H, W = score.shape
    p = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    keep = jnp.ones_like(score, dtype=bool)
    idx = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n = p[1 + dy: 1 + dy + H, 1 + dx: 1 + dx + W]
            if (dy, dx) < (0, 0) or (dy == 0 and dx < 0):
                keep &= score >= n      # earlier neighbour may tie
            else:
                keep &= score > n       # later neighbour must lose
            idx += 1
    return jnp.where(keep, score, 0.0)
