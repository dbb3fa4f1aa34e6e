"""Hamming-distance descriptor matching, designed for the MXU.

TPU-native replacement for ORB-SLAM3's ORBmatcher
(slam_backends/orb_slam_3/CMakeLists.txt:53). The C++ code computes
per-pair XOR+popcount in a scalar loop; on TPU we use the identity

    hamming(a, b) = popcount(a) + popcount(b) - 2 * <bits(a), bits(b)>

so the full N x M distance matrix is ONE matmul of {0,1} bit matrices
— exactly the large, batched, bf16-friendly shape the 128x128 systolic
array wants. 1250x256 @ 256x1250 is ~0.8 GFLOP: microseconds on a v5e.

Match post-processing (mutual nearest, ratio test, rotation-consistency
histogram — ORBmatcher's CheckOrientation) is all dense masked argmin
work on the same matrix; no data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

INVALID_DIST = 1e9
N_ROT_BINS = 30  # ORBmatcher HISTO_LENGTH


def unpack_u32_to_bits(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) {0,1} in ``dtype`` (bf16 for the MXU:
    0/1 values and <=256 partial sums are exact)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(dtype)


def pack_bits_to_u32(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) {0,1} -> (N, 8) uint32 (inverse of unpack)."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[0], 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(b * weights, axis=2, dtype=jnp.uint32)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8), (M, 8) uint32 -> (N, M) float32 Hamming distances."""
    a = unpack_u32_to_bits(desc_a)
    b = unpack_u32_to_bits(desc_b)
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    pa = jnp.sum(a.astype(jnp.float32), -1)
    pb = jnp.sum(b.astype(jnp.float32), -1)
    return pa[:, None] + pb[None, :] - 2.0 * dot


class Matches(NamedTuple):
    """Fixed-size match set: for every row (query) descriptor, the
    matched column index (or -1) and its distance."""

    idx: jnp.ndarray    # (N,) int32 — column index in B, -1 if unmatched
    dist: jnp.ndarray   # (N,) float32
    valid: jnp.ndarray  # (N,) bool

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def _masked(dist: jnp.ndarray, valid_a, valid_b, extra_mask) -> jnp.ndarray:
    m = valid_a[:, None] & valid_b[None, :]
    if extra_mask is not None:
        m = m & extra_mask
    return jnp.where(m, dist, INVALID_DIST)


def match_descriptors(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    max_dist: float = 100.0,
    ratio: float = 0.9,
    mutual: bool = True,
    extra_mask: Optional[jnp.ndarray] = None,
    angles_a: Optional[jnp.ndarray] = None,
    angles_b: Optional[jnp.ndarray] = None,
    return_col: bool = False,
):
    """Best-match search A -> B with distance/ratio/mutual/rotation tests.

    extra_mask: optional (N, M) bool of admissible pairs (projection
    window, octave gates — the search-by-projection constraints).
    angles_*: if given, apply ORBmatcher-style rotation-consistency
    filtering (keep only matches whose angle difference falls in the 3
    most popular of 30 histogram bins).

    return_col=True additionally returns the COLUMN view of the same
    1-1 match set (requires mutual=True): a Matches over B whose idx
    points into A. When A is a large landmark table and B a small
    keypoint set, downstream per-match math (pose GN) should run in
    column space — M rows instead of N (the N-row form wastes ~N/M of
    every batched Jacobian op; at flagship capacity that was 64x).
    """
    d = _masked(hamming_matrix(desc_a, desc_b), valid_a, valid_b, extra_mask)

    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)          # (N,)
    best = jnp.min(d, axis=1)
    if ratio < 1e6:
        # Second best for the ratio test. Masking the best entry with
        # an elementwise compare, NOT d.at[rows, best_idx].set(...):
        # scatters on an (N, M) matrix lower near-serially on TPU
        # (CLAUDE.md), and search-by-projection calls disable the
        # ratio test entirely (ratio=1e9), so the whole second-best
        # pass is skipped at trace time there.
        cols = jnp.arange(d.shape[1], dtype=jnp.int32)
        d2 = jnp.where(cols[None, :] == best_idx[:, None],
                       INVALID_DIST, d)
        second = jnp.min(d2, axis=1)
        ok = (best <= max_dist) & (best < ratio * second)
    else:
        ok = best <= max_dist

    if mutual:
        back = jnp.argmin(d, axis=0).astype(jnp.int32)          # (M,)
        ok &= back[best_idx] == jnp.arange(d.shape[0], dtype=jnp.int32)

    if angles_a is not None and angles_b is not None:
        rot_ok = _rotation_consistent(angles_a, angles_b, best_idx, ok)
        ok &= rot_ok

    row = Matches(
        idx=jnp.where(ok, best_idx, -1),
        dist=jnp.where(ok, best, INVALID_DIST),
        valid=ok,
    )
    if not return_col:
        return row
    assert mutual, "column view is defined by the mutual 1-1 match set"
    # Column j's mutual partner is back[j]; it is a real match iff that
    # row survived every row-space test (ok gathers M small reads).
    col_ok = ok[back] & (best_idx[back]
                         == jnp.arange(d.shape[1], dtype=jnp.int32))
    col = Matches(
        idx=jnp.where(col_ok, back, -1),
        dist=jnp.where(col_ok, best[back], INVALID_DIST),
        valid=col_ok,
    )
    return row, col


def _rotation_consistent(
    angles_a: jnp.ndarray, angles_b: jnp.ndarray,
    best_idx: jnp.ndarray, ok: jnp.ndarray,
) -> jnp.ndarray:
    """ORBmatcher CheckOrientation: 30-bin histogram of match angle
    deltas; keep matches in the 3 fullest bins."""
    da = angles_a - angles_b[best_idx]
    da = jnp.mod(da, 2 * jnp.pi)                                 # [0, 2pi)
    bins = jnp.floor(da / (2 * jnp.pi) * N_ROT_BINS).astype(jnp.int32)
    bins = jnp.clip(bins, 0, N_ROT_BINS - 1)
    onehot = jax.nn.one_hot(bins, N_ROT_BINS, dtype=jnp.float32)
    counts = jnp.sum(onehot * ok[:, None].astype(jnp.float32), axis=0)
    _, top3 = jax.lax.top_k(counts, 3)
    return (bins[:, None] == top3[None, :]).any(axis=1)


def projection_window_mask(
    uv_pred: jnp.ndarray, uv_kp: jnp.ndarray, radius,
    octave_pred: Optional[jnp.ndarray] = None,
    octave_kp: Optional[jnp.ndarray] = None,
    octave_slack: int = 1,
    octave_gate: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(N, 2) predicted positions x (M, 2) keypoints -> (N, M) bool mask
    of pairs within ``radius`` px (and +-octave_slack levels if given).
    The search-by-projection window of ORBmatcher::SearchByProjection.

    radius: scalar or per-row (N,) array (ORB-SLAM widens the window by
    the predicted octave's scale). octave_gate: optional (N,) bool —
    rows where the octave test applies (rows without scale statistics
    pass through ungated)."""
    d2 = jnp.sum((uv_pred[:, None, :] - uv_kp[None, :, :]) ** 2, -1)
    r2 = jnp.asarray(radius, d2.dtype) ** 2
    if r2.ndim == 1:
        r2 = r2[:, None]
    m = d2 <= r2
    if octave_pred is not None and octave_kp is not None:
        dlvl = jnp.abs(octave_pred[:, None] - octave_kp[None, :])
        ok = dlvl <= octave_slack
        if octave_gate is not None:
            ok = ok | ~octave_gate[:, None]
        m &= ok
    return m
