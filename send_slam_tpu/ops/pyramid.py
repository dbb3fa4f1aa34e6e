"""Grayscale image pyramid + Gaussian blur, pure JAX.

The TPU-native equivalent of ORBextractor's ComputePyramid
(ORB-SLAM3 ORBextractor, slam_backends/orb_slam_3/CMakeLists.txt:52):
``n_levels`` levels at scale factor 1.2, each level blurred before
descriptor sampling (ORB uses GaussianBlur(7,7,2)). All shapes are
static Python ints so the whole pyramid builds inside one jit trace.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_six_fifths(scale: float) -> bool:
    return abs(scale - 1.2) < 1e-9


def level_shapes(height: int, width: int, n_levels: int, scale: float) -> Tuple[Tuple[int, int], ...]:
    """Static (H, W) per level.

    For the ORB default scale 1.2 == 6/5 each level is EXACTLY 5/6 of
    the rows/cols of the previous one (``(dim // 6) * 5``; up to 5
    remainder rows/cols at the bottom/right edge are cropped, inside
    the ORB border margin anyway). The exact ratio is what lets
    build_pyramid run as static strided slices + elementwise f32 —
    bit-identical between TPU and CPU — instead of a backend-dependent
    resize matmul. Other scales fall back to round(dim / scale**i).
    """
    if _is_six_fifths(scale):
        out = [(height, width)]
        for _ in range(1, n_levels):
            h, w = out[-1]
            out.append((max((h // 6) * 5, 5), max((w // 6) * 5, 5)))
        return tuple(out)
    out = []
    for i in range(n_levels):
        s = scale ** i
        out.append((int(round(height / s)), int(round(width / s))))
    return tuple(out)


def _gaussian_kernel1d(sigma: float, ksize: int) -> np.ndarray:
    # Matches cv2.getGaussianKernel for odd ksize.
    r = (ksize - 1) / 2
    x = np.arange(ksize) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, ksize: int = 7) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 borders (cv2 default).

    img: (H, W) float32. Implemented as explicit shifted-slice weighted
    sums: a (1, k) depthless conv lowers pathologically on TPU (~8 ms
    at 640x480) while 2k fused VPU multiply-adds are memory-bound
    (<1 ms).
    """
    k = _gaussian_kernel1d(sigma, ksize)
    pad = ksize // 2
    H, W = img.shape
    x = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    # Horizontal pass.
    acc = None
    for i in range(ksize):
        term = float(k[i]) * x[:, i:i + W]
        acc = term if acc is None else acc + term
    # Vertical pass.
    out = None
    for i in range(ksize):
        term = float(k[i]) * acc[i:i + H, :]
        out = term if out is None else out + term
    return out


# Half-pixel bilinear downsample by exactly 6:5. Output row i = 5q + r
# samples input coordinate (i + 0.5) * 1.2 - 0.5 = 6q + (1.2 r + 0.1):
# a fixed (offset, weight) per residue class r.
_PHASE = ((0, 0.1), (1, 0.3), (2, 0.5), (3, 0.7), (4, 0.9))


def _down65_rows(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (5 * (H // 6), W): exact 6:5 bilinear over rows."""
    H, W = x.shape
    q = H // 6
    g = x[: q * 6].reshape(q, 6, W)
    outs = [(1.0 - w) * g[:, o, :] + w * g[:, o + 1, :]
            for (o, w) in _PHASE]
    return jnp.stack(outs, 1).reshape(q * 5, W)


def _down65_cols(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H, 5 * (W // 6)): exact 6:5 bilinear over columns."""
    H, W = x.shape
    q = W // 6
    g = x[:, : q * 6].reshape(H, q, 6)
    outs = [(1.0 - w) * g[:, :, o] + w * g[:, :, o + 1]
            for (o, w) in _PHASE]
    return jnp.stack(outs, 2).reshape(H, q * 5)


def build_pyramid(
    img: jnp.ndarray, n_levels: int, scale: float,
) -> List[jnp.ndarray]:
    """(H, W) float32 -> list of n_levels images, each ~1/scale smaller.

    Linear (half-pixel) resampling from the previous level like
    ORB-SLAM3's repeated cv::resize INTER_LINEAR. At the default scale
    1.2 the resample is an EXACT 5-phase strided-slice bilinear (see
    level_shapes): pure elementwise f32, so every level is
    bit-identical between TPU and CPU — jax.image.resize lowers to
    matmuls whose last-ULP accumulation differences seed FAST-score
    comparison flips and descriptor-bit noise that made the two
    backends diverge into different KF-cascade basins (CLAUDE.md
    round-3 findings). Level-L pixel (x, y) maps to level-0
    coordinates ((x + 0.5) * 1.2**L - 0.5, ...): the per-level
    half-pixel affine maps telescope exactly.
    """
    shapes = level_shapes(img.shape[0], img.shape[1], n_levels, scale)
    levels = [img]
    if _is_six_fifths(scale):
        for i in range(1, n_levels):
            nxt = _down65_cols(_down65_rows(levels[-1]))
            assert nxt.shape == shapes[i], (nxt.shape, shapes[i])
            levels.append(nxt)
        return levels
    for i in range(1, n_levels):
        prev = levels[-1]
        levels.append(jax.image.resize(prev, shapes[i], method="linear"))
    return levels
