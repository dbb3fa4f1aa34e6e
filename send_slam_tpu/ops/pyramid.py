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


def level_shapes(height: int, width: int, n_levels: int, scale: float) -> Tuple[Tuple[int, int], ...]:
    """Static (H, W) per level: round(dim / scale**i)."""
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


def build_pyramid(
    img: jnp.ndarray, n_levels: int, scale: float,
) -> List[jnp.ndarray]:
    """(H, W) float32 -> list of n_levels images, each ~1/scale smaller.

    Linear (half-pixel) resampling from the previous level like
    ORB-SLAM3's repeated cv::resize INTER_LINEAR.
    """
    shapes = level_shapes(img.shape[0], img.shape[1], n_levels, scale)
    levels = [img]
    for i in range(1, n_levels):
        prev = levels[-1]
        levels.append(jax.image.resize(prev, shapes[i], method="linear"))
    return levels
