"""Segment reductions and row gathers over a fixed index map.

The bundle-adjustment inner loop needs, per Gauss-Newton iteration:
  - seg_sum:  accumulate per-observation blocks into per-landmark slots
              (g2o's edge->vertex Hessian assembly);
  - gather:   read per-landmark state back at each observation.

On TPU, XLA lowers general scatters/gathers to near-serial loops
(measured on v5e: 10k-row scatter-add ~6 ms, 80k-row gather ~70 ms) —
while the same reductions as {0,1} one-hot matmuls run on the MXU at
memory bandwidth. ObsMap builds the one-hot ONCE per (fixed) index map
— BA iterations reuse it — and falls back to native scatter/gather on
CPU, where those are fast and the one-hot would be the slow path.

Layout note: the one-hot is stored TRANSPOSED, (L, R) — seg_sum is
then a plain (L, R) @ (R, D) matmul. Storing it (R, L) makes every
seg_sum a lhs-transposed contraction that costs a physical ~164 MB
relayout per call on TPU (measured 40 ms vs ~4 ms). The gather
direction instead multiplies the SMALL operand on the left,
(D, L) @ (L, R), and transposes the small (D, R) result — small-minor
transposes are cheap, big-array transposes are not.

Exactness: the one-hot is exactly representable in bf16, so a bf16
one-hot times an f32 operand SPLIT as hi+lo (two bf16 matmuls, f32
accumulation, ~2^-16 relative) or hi+mid+lo (three passes, f32-faithful
~2^-24) reproduces f32 gather/scatter. The BA engine uses the exact
forms for Hessian/gradient assembly and the three-pass form for state
(landmark position) gathers: plain bf16 rounding there is NOT absorbed
by Levenberg damping — it random-walks the window's weakly-anchored
monocular-scale gauge (round-4 forensics: 2-70x map-scale wander).
The partial products MUST be summed through _sum_passes: a plain
dot+dot add gets algebraically rewritten by XLA into a single bf16
dot, silently discarding the low parts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    import os
    if os.environ.get("SLAM_FORCE_CPU_PATHS") == "1":
        return False  # diagnostic — see ops/orb.py _on_tpu
    try:
        return "tpu" in jax.devices()[0].platform.lower() or \
            "tpu" in str(jax.devices()[0].device_kind).lower()
    except Exception:
        return False


def _split_hi_lo(v: jnp.ndarray):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(v.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _split3(v: jnp.ndarray):
    """Three-way bf16 split: 3 x 8 mantissa bits covers the full f32
    mantissa, so the three-pass matmul reproduces an f32 gather to
    ~2^-24 relative. Needed wherever the gathered quantity is STATE
    whose error lands in near-zero residuals: a 2^-16 (two-pass)
    position gather injects fx * 2^-16 * |X| / z ~ 0.03 px of fresh
    pseudo-noise into every BA residual each dispatch — a
    self-sustaining random walk along the window's weakly-anchored
    gauge directions (measured round 4: the map scale wandered 2-70x
    over a 90-frame run; three-pass + exact assembly holds it)."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(v.dtype)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(v.dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def _mm(a16: jnp.ndarray, b16: jnp.ndarray) -> jnp.ndarray:
    """(A, K) bf16 @ (K, B) bf16 -> (A, B) f32, plain orientation."""
    return jax.lax.dot_general(
        a16, b16, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _sum_passes(parts):
    """Sum multi-pass split matmul results WITHOUT letting XLA's
    algebraic simplifier merge them. dot(A, hi) + dot(A, lo) is exactly
    the pattern the dot-add rewrite folds into dot(A, hi + lo) — and
    the operand add happens in bf16, which rounds `lo` away entirely,
    silently turning the two-pass exact split back into single-pass
    bf16. (Observed in-graph round 4: exact-split BA assembly inside
    the jitted frame_step produced results byte-identical to the bf16
    path, while the same split in a standalone jit differed as
    expected — whether the rewrite fires depends on the surrounding
    graph.) An optimization_barrier between the partial products pins
    the f32 accumulation."""
    acc = parts[0]
    for p in parts[1:]:
        acc = jax.lax.optimization_barrier(acc) + p
    return acc


class ObsMap:
    """A fixed map of R observation rows onto L segment slots.

    ids: (R,) int32 in [0, L]; rows with ids == L are dropped (both
    paths treat L as the spill slot). The map must not change between
    uses — build a new ObsMap when it does.
    """

    def __init__(self, ids: jnp.ndarray, L: int):
        self.ids = ids
        self.L = L
        self.R = ids.shape[0]
        if _on_tpu():
            # (L, R) exact one-hot (transposed storage — see module
            # docstring); columns with ids == L are all-zero.
            self.oh_t = (jnp.arange(L)[:, None] == ids[None, :]) \
                .astype(jnp.bfloat16)
        else:
            self.oh_t = None
            self._ok = (ids >= 0) & (ids < L)

    # -- segment sums --------------------------------------------------

    def seg_sum(self, values: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
        """(R, D) -> (L, D) sum of values per slot.

        exact=False rounds values to bf16 (one MXU pass); exact=True
        splits them hi+lo (two passes, ~f32 exact)."""
        if self.oh_t is None:
            return jnp.zeros((self.L, values.shape[-1]), values.dtype) \
                .at[self.ids].add(values, mode="drop")
        if not exact:
            return _mm(self.oh_t, values.astype(jnp.bfloat16))
        hi, lo = _split_hi_lo(values)
        return _sum_passes([_mm(self.oh_t, hi), _mm(self.oh_t, lo)])

    def seg_sum_batched(self, values: jnp.ndarray,
                        exact: bool = False,
                        minor_l: bool = False) -> jnp.ndarray:
        """(B, Rb, D) -> (B, L, D) with ids viewed as (B, Rb): batched
        per-block segment sums (the H_pl pose-landmark cross blocks,
        one block per window keyframe).

        minor_l=True returns (B, D, L) instead — L on the minor (lane)
        axis, the layout the BA Schur stage wants (small trailing dims
        like (..., 6, 3) waste ~40x lane padding on TPU)."""
        B, Rb, D = values.shape
        if self.oh_t is None:
            ids_b = self.ids.reshape(B, Rb)
            out = jnp.zeros((B, self.L, D), values.dtype)
            rows = jnp.broadcast_to(
                jnp.arange(B)[:, None], (B, Rb)).reshape(-1)
            out = out.at[rows, ids_b.reshape(-1)].add(
                values.reshape(-1, D), mode="drop")
            return out.transpose(0, 2, 1) if minor_l else out
        # (L, R) -> (L, B, Rb): splitting the minor axis is free; the
        # per-batch contraction then hits the minor axis of each
        # (L, Rb) slice — no relayout.
        oh_b = self.oh_t.reshape(self.L, B, Rb)
        spec = 'lbr,brd->bdl' if minor_l else 'lbr,brd->bld'

        def ein(v16):
            return jnp.einsum(spec, oh_b, v16,
                              preferred_element_type=jnp.float32)

        if not exact:
            return ein(values.astype(jnp.bfloat16))
        hi, lo = _split_hi_lo(values)
        return _sum_passes([ein(hi), ein(lo)])

    def seg_sum_t(self, values_t: jnp.ndarray,
                  exact: bool = False) -> jnp.ndarray:
        """(D, R) -> (D, L): like seg_sum but with R-minor values and
        L-minor output — the contraction hits the minor axis of both
        operands and the result needs no relayout either."""
        if self.oh_t is None:
            return jnp.zeros((self.L, values_t.shape[0]), values_t.dtype) \
                .at[self.ids].add(values_t.T, mode="drop").T

        def mm(v16):
            return jax.lax.dot_general(
                v16, self.oh_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if not exact:
            return mm(values_t.astype(jnp.bfloat16))
        hi, lo = _split_hi_lo(values_t)
        return _sum_passes([mm(hi), mm(lo)])

    def seg_sum_batched_t(self, values: jnp.ndarray,
                          exact: bool = False) -> jnp.ndarray:
        """(B, D, Rb) -> (B, D, L) with ids viewed as (B, Rb): the
        all-minor-contraction form of seg_sum_batched (values carry Rb
        on lanes, output carries L on lanes)."""
        B, D, Rb = values.shape
        if self.oh_t is None:
            ids_b = self.ids.reshape(B, Rb)
            out = jnp.zeros((B, self.L, D), values.dtype)
            rows = jnp.broadcast_to(
                jnp.arange(B)[:, None], (B, Rb)).reshape(-1)
            out = out.at[rows, ids_b.reshape(-1)].add(
                values.transpose(0, 2, 1).reshape(-1, D), mode="drop")
            return out.transpose(0, 2, 1)
        oh_b = self.oh_t.reshape(self.L, B, Rb)

        def ein(v16):
            return jnp.einsum('lbr,bdr->bdl', oh_b, v16,
                              preferred_element_type=jnp.float32)

        if not exact:
            return ein(values.astype(jnp.bfloat16))
        hi, lo = _split_hi_lo(values)
        return _sum_passes([ein(hi), ein(lo)])

    # -- gathers -------------------------------------------------------

    def gather(self, table: jnp.ndarray, exact: bool = True) -> jnp.ndarray:
        """(L, D) -> (R, D), rows with ids == L read zero.

        Computed as (D, L) @ (L, R) with the SMALL operand transposed —
        transposing the big one-hot would relayout ~L*R bytes.
        exact=True (default) splits the table hi+lo (two passes, ~f32
        exact — landmark POSITIONS need this); exact=False rounds it to
        bf16 (one pass — fine for increments, where the rounding is
        relative to the step, not the state)."""
        if self.oh_t is None:
            out = table[jnp.clip(self.ids, 0, self.L - 1)]
            return jnp.where(self._ok[:, None], out, 0.0)
        if not exact:
            return _mm(table.T.astype(jnp.bfloat16), self.oh_t).T
        hi, lo = _split_hi_lo(table.T)                  # (D, L), small
        out_t = _sum_passes([_mm(hi, self.oh_t),
                             _mm(lo, self.oh_t)])       # (D, R)
        return out_t.T                                   # (R, D) small-minor

    def gather_t(self, table_t: jnp.ndarray,
                 exact: bool = True, full: bool = False) -> jnp.ndarray:
        """(D, L) -> (D, R): gather with L-minor table and R-minor
        output — the fully relayout-free direction.

        full=True uses the three-pass split (~2^-24, f32-faithful) —
        REQUIRED for state tables (landmark positions) whose gather
        error lands in near-zero residuals; see _split3."""
        if self.oh_t is None:
            out = table_t[:, jnp.clip(self.ids, 0, self.L - 1)]
            return jnp.where(self._ok[None, :], out, 0.0)
        if full:
            hi, mid, lo = _split3(table_t)
            return _sum_passes([_mm(hi, self.oh_t), _mm(mid, self.oh_t),
                                _mm(lo, self.oh_t)])
        if not exact:
            return _mm(table_t.astype(jnp.bfloat16), self.oh_t)
        hi, lo = _split_hi_lo(table_t)
        return _sum_passes([_mm(hi, self.oh_t), _mm(lo, self.oh_t)])
