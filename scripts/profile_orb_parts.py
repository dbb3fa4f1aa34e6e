"""Micro-profile of extract_orb's pieces on the default backend.

Varies inputs per call (relay-cache-proof) and charges queued device
execution to the op via a tail fetch, like profile_kf_steps.py.
"""

import os
import sys
import time

sys.path.insert(0, ".")
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from send_slam_tpu.config import OrbConfig
from send_slam_tpu.ops.fast import fast_score_map, nms3x3
from send_slam_tpu.ops.orb import (
    _fast_score, _gather_patches, _grid_topk, brief_from_patches,
    extract_orb, ic_angle_from_patches,
)
from send_slam_tpu.ops.pyramid import build_pyramid, gaussian_blur


def bench(name, fn, inputs, leaf, n=16):
    """fn(x) with x cycling over `inputs`; per-call = (dispatch+drain)/n."""
    out = fn(inputs[0])
    np.asarray(leaf(out))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(inputs[i % len(inputs)])
    np.asarray(leaf(out))
    per = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {per:8.2f} ms/call", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    orb = OrbConfig()
    rng = np.random.default_rng(0)
    H, W = 480, 640
    imgs = [jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
            for _ in range(8)]
    jax.block_until_ready(imgs)

    n0 = orb.per_level_features[0]

    bench("fast_score(pallas,640)", jax.jit(lambda im: _fast_score(im, 7.0)),
          imgs, lambda o: o[0, 0])
    bench("fast+nms3x3(640)",
          jax.jit(lambda im: nms3x3(_fast_score(im, 7.0))),
          imgs, lambda o: o[0, 0])
    bench("gaussian_blur(640)", jax.jit(lambda im: gaussian_blur(
        im, sigma=2.0, ksize=7)), imgs, lambda o: o[0, 0])
    bench("build_pyramid(8)", jax.jit(lambda im: build_pyramid(
        im, orb.n_levels, orb.scale_factor)), imgs, lambda o: o[-1][0, 0])

    def sel(im):
        s_lo = nms3x3(_fast_score(im, 7.0))
        s_hi = jnp.where(s_lo > 20.0, s_lo, 0.0)
        return _grid_topk(s_hi, s_lo, n0, orb.grid_cells)
    bench(f"grid_topk(640,n={n0})", jax.jit(sel), imgs, lambda o: o[0][0])

    uv0, _, _ = jax.jit(sel)(imgs[0])
    uvs = [jax.jit(sel)(im)[0] for im in imgs]
    jax.block_until_ready(uvs)

    k = [0]
    def gath(im):
        k[0] += 1
        return _gather_patches(im, uvs[k[0] % len(uvs)], 16)
    bench(f"gather_patches(K={n0},33x33)", jax.jit(gath), imgs,
          lambda o: o[0, 0, 0])

    patches = [jax.jit(lambda im, uv: _gather_patches(im, uv, 16))(im, uv)
               for im, uv in zip(imgs, uvs)]
    jax.block_until_ready(patches)
    bench("ic_angle(patches)", jax.jit(ic_angle_from_patches), patches,
          lambda o: o[0])
    angles = [jax.jit(ic_angle_from_patches)(p) for p in patches]
    jax.block_until_ready(angles)

    j = [0]
    def brf(p):
        j[0] += 1
        return brief_from_patches(p, angles[j[0] % len(angles)])
    bench("brief(patches)", jax.jit(brf), patches, lambda o: o[0, 0])

    bench("extract_orb(full,1250x8)", jax.jit(
        lambda im: extract_orb(im, orb)), imgs, lambda o: o.uv[0])


if __name__ == "__main__":
    main()
