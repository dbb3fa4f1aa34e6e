"""Fused FAST-16 score kernel (Pallas TPU).

One VMEM pass per row-tile: the padded tile is DMA'd from HBM once and
all 16 Bresenham-circle differences, the arc-9 corner test (bit-mask
run detection) and the arc-min score are computed in-register — the
pure-jnp version (ops/fast.py) makes XLA materialize 16 shifted copies
of the image (~17x HBM traffic); here every input byte moves once.

Alignment discipline (Mosaic requires tile-aligned DMA slices for f32:
(8, 128) tiles): row halo is 8 (>= the 3 the circle needs) so every
dynamic row slice has 8-aligned start and size; the width is padded to
a lane multiple and only statically sliced inside the kernel.

Grid: row tiles of height TH, double-buffered DMA (pallas_guide.md
pattern); ragged edges are handled by edge padding baked into the
input and cropped after.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from send_slam_tpu.ops.fast import CIRCLE_OFFSETS

_HALO = 8     # row halo (8-aligned; circle needs only 3)
_CPAD = 4     # static column halo (circle needs 3, fused NMS +1)


def _fast_tile(tile, threshold, TH, OW, with_nms):
    """tile: (TH+16, Wp) f32 -> score (TH, OW) f32.

    VMEM-frugal formulation: circle differences are sliced on the fly
    (the tile itself is the only large live buffer) and the arc scan
    keeps a rolling min window instead of 16 materialized diff planes —
    peak live temporaries stay at ~6 tile-sized buffers.

    with_nms fuses the 3x3 non-max suppression: scores are computed on
    a 1-px-halo region (the tile's 8-row/3-col halo covers it) and
    suppressed in-register — no second HBM pass over the score map."""
    # Score region including the NMS halo.
    hy = 1 if with_nms else 0
    RH, RW = TH + 2 * hy, OW + 2 * hy
    r0, c0 = _HALO - hy, _CPAD - hy
    center = tile[r0:r0 + RH, c0:c0 + RW]

    def d(j):
        dx, dy = CIRCLE_OFFSETS[j % 16]
        view = tile[r0 + dy:r0 + dy + RH, c0 + dx:c0 + dx + RW]
        return view - center

    bright = jnp.zeros((RH, RW), jnp.int32)
    dark = jnp.zeros((RH, RW), jnp.int32)
    for j in range(16):
        dj = d(j)
        bit = jnp.int32(1 << j)
        bright = bright | jnp.where(dj > threshold, bit, 0)
        dark = dark | jnp.where(dj < -threshold, bit, 0)

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
            m = sign * d(s)
            for k in range(1, 9):
                m = jnp.minimum(m, sign * d(s + k))
            best = m if best is None else jnp.maximum(best, m)
        return best

    score = jnp.maximum(arc9(1.0), arc9(-1.0))
    score = jnp.where(is_corner, score, 0.0)
    if not with_nms:
        return score

    # 3x3 NMS with raster-order tie-breaks (matches ops.fast.nms3x3).
    c = score[1:1 + TH, 1:1 + OW]
    keep = jnp.ones((TH, OW), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = score[1 + dy:1 + dy + TH, 1 + dx:1 + dx + OW]
            if (dy, dx) < (0, 0):
                keep &= c >= n
            else:
                keep &= c > n
    return jnp.where(keep, c, 0.0)


def _kernel(img_hbm, out_ref, scratch, sem, *, TH, OW, threshold, n_tiles,
            with_nms):
    i = pl.program_id(0)

    def get_dma(slot, tile_idx):
        start = pl.multiple_of(tile_idx * TH, 8)
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(start, TH + 2 * _HALO), :],
            scratch.at[slot],
            sem.at[slot],
        )

    # Double-buffered: start tile i+1 before computing tile i.
    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        get_dma((i + 1) % 2, i + 1).start()

    get_dma(i % 2, i).wait()
    tile = scratch[i % 2]
    out_ref[:, :] = _fast_tile(tile, threshold, TH, OW, with_nms)


def _kernel_batched(img_hbm, out_ref, scratch, sem, *, TH, OW, threshold,
                    n_tiles, with_nms):
    """Batch-aware variant: grid (B, n_tiles), the (B, Hp, Wp) input
    stays whole-array in memory space ANY (Mosaic's constraint for
    manually-DMA'd operands) and the kernel indexes the batch row
    itself. Needed because vmap's generic pallas batching rule blocks
    the INPUT spec over the batch axis, which ANY-space operands do
    not support — multicam's vmap(per_cam) over make_frame hit exactly
    that on the real chip (round-5 TPU lane run)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    def get_dma(slot, tile_idx):
        start = pl.multiple_of(tile_idx * TH, 8)
        return pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(start, TH + 2 * _HALO), :],
            scratch.at[slot],
            sem.at[slot],
        )

    # Double-buffered within each batch row (one bubble per row).
    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(i + 1 < n_tiles)
    def _():
        get_dma((i + 1) % 2, i + 1).start()

    get_dma(i % 2, i).wait()
    tile = scratch[i % 2]
    out_ref[0, :, :] = _fast_tile(tile, threshold, TH, OW, with_nms)


def _geometry(H: int, W: int):
    TH = 32
    n_tiles = -(-H // TH)
    Hp = n_tiles * TH
    OW = -(-W // 128) * 128                 # lane-aligned output width
    Wp = -(-(OW + 2 * _CPAD) // 128) * 128  # padded input width
    return TH, n_tiles, Hp, OW, Wp


def _call_single(img, threshold, with_nms, interpret):
    H, W = img.shape
    TH, n_tiles, Hp, OW, Wp = _geometry(H, W)
    padded = jnp.pad(
        img,
        ((_HALO, Hp - H + _HALO), (_CPAD, Wp - W - _CPAD)),
        mode="edge")
    kernel = functools.partial(
        _kernel, TH=TH, OW=OW, threshold=float(threshold), n_tiles=n_tiles,
        with_nms=with_nms)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, OW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, OW), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * _HALO, Wp), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    return out[:H, :W]


def _call_batched(imgs, threshold, with_nms, interpret):
    B, H, W = imgs.shape
    TH, n_tiles, Hp, OW, Wp = _geometry(H, W)
    padded = jnp.pad(
        imgs,
        ((0, 0), (_HALO, Hp - H + _HALO), (_CPAD, Wp - W - _CPAD)),
        mode="edge")
    kernel = functools.partial(
        _kernel_batched, TH=TH, OW=OW, threshold=float(threshold),
        n_tiles=n_tiles, with_nms=with_nms)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TH, OW), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, OW), imgs.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * _HALO, Wp), imgs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    return out[:, :H, :W]


@functools.partial(jax.jit, static_argnames=(
    "threshold", "interpret", "with_nms"))
def fast_score_map_pallas(
    img: jnp.ndarray, threshold: float, interpret: bool = False,
    with_nms: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.fast.fast_score_map on TPU; with
    with_nms=True it fuses nms3x3 as well.

    vmap-safe: a custom batching rule maps one level of vmap onto the
    batch-gridded kernel (multicam's per-lane vmap) instead of the
    generic pallas batching rule, which cannot block an ANY-space
    manually-DMA'd operand."""

    @jax.custom_batching.custom_vmap
    def call(x):
        return _call_single(x, threshold, with_nms, interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, xs):  # noqa: ANN001 — jax API
        del axis_size, in_batched
        return _call_batched(xs, threshold, with_nms, interpret), True

    return call(img)
