"""Fused FAST-16 score kernel (Pallas TPU).

One VMEM pass per row-tile: the padded tile is DMA'd from HBM once and
all 16 Bresenham-circle differences, the arc-9 corner test (bit-mask
run detection) and the arc-min score are computed in-register — the
pure-jnp version (ops/fast.py) makes XLA materialize 16 shifted copies
of the image (~17x HBM traffic); here every input byte moves once.

Grid: row tiles of height TH with a 3-row halo, double-buffered DMA
(pallas_guide.md pattern). The last tile handles the ragged remainder
via edge padding baked into the input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from send_slam_tpu.ops.fast import CIRCLE_OFFSETS

_PAD = 3


def _fast_tile(tile, threshold, TH, W):
    """tile: (TH+6, W+6) f32 -> score (TH, W) f32."""
    center = tile[_PAD:_PAD + TH, _PAD:_PAD + W]
    ds = []
    for dx, dy in CIRCLE_OFFSETS:
        view = tile[_PAD + dy:_PAD + dy + TH, _PAD + dx:_PAD + dx + W]
        ds.append(view - center)

    bright = jnp.zeros_like(center, jnp.int32)
    dark = jnp.zeros_like(center, jnp.int32)
    for i, d in enumerate(ds):
        bit = jnp.int32(1 << i)
        bright = bright | jnp.where(d > threshold, bit, 0)
        dark = dark | jnp.where(d < -threshold, bit, 0)

    def has_run9(m):
        m = m | (m << 16)
        r2 = m & (m >> 1)
        r4 = r2 & (r2 >> 2)
        r8 = r4 & (r4 >> 4)
        r9 = r8 & (m >> 8)
        return (r9 & 0xFFFF) != 0

    is_corner = has_run9(bright) | has_run9(dark)

    def arc9(sign):
        best = None
        for s in range(16):
            m = sign * ds[s]
            for k in range(1, 9):
                m = jnp.minimum(m, sign * ds[(s + k) % 16])
            best = m if best is None else jnp.maximum(best, m)
        return best

    score = jnp.maximum(arc9(1.0), arc9(-1.0))
    return jnp.where(is_corner, score, 0.0)


def _kernel(img_hbm, out_ref, scratch, sem, *, TH, W, Wp, threshold,
            n_tiles):
    i = pl.program_id(0)

    def get_dma(slot, tile_idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(tile_idx * TH, TH + 2 * _PAD), :],
            scratch.at[slot],
            sem.at[slot],
        )

    # Double-buffered: tile i was started by the previous iteration
    # (or here for i == 0); start i+1 before computing.
    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        get_dma((i + 1) % 2, i + 1).start()

    get_dma(i % 2, i).wait()
    tile = scratch[i % 2]
    out_ref[:, :] = _fast_tile(tile, threshold, TH, W)[:, :W]


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_map_pallas(
    img: jnp.ndarray, threshold: float, interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.fast.fast_score_map on TPU."""
    H, W = img.shape
    TH = 64
    n_tiles = -(-H // TH)
    Hp = n_tiles * TH
    # Lane-align the padded width so tile rows are contiguous multiples
    # of 128 where possible; edge-pad (border is masked downstream).
    Wp = W + 2 * _PAD
    padded = jnp.pad(img, ((_PAD, Hp - H + _PAD), (_PAD, _PAD)),
                     mode="edge")

    kernel = functools.partial(
        _kernel, TH=TH, W=W, Wp=Wp, threshold=float(threshold),
        n_tiles=n_tiles)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, W), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * _PAD, Wp), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    return out[:H]
