"""Primitive-op cost on the default backend at SLAM-relevant sizes:
scatter-add vs one-hot matmul, general gather vs one-hot gather, sort,
top_k, unique. Varying inputs per call; tail fetch drains the queue.
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


def bench(name, fn, inputs, leaf, n=10):
    out = fn(*inputs[0])
    np.asarray(leaf(out))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*inputs[i % len(inputs)])
    np.asarray(leaf(out))
    per = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {per:8.2f} ms/call", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    NOBS, LC = 10000, 5000          # local-BA window obs -> compact lms
    WOBS, WLC = 80000, 8192         # wide-BA obs -> landmark table

    def mk(nobs, lc, k):
        ids = jnp.asarray(rng.integers(0, lc, (nobs,)), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(nobs, 18)), jnp.float32)
        return ids, vals

    sets = [mk(NOBS, LC, 18) for _ in range(6)]
    wsets = [mk(WOBS, WLC, 18) for _ in range(6)]

    # scatter-add (the BA H_ll/H_pl accumulation pattern)
    bench("scatter_add 10k->(5k,18)", jax.jit(
        lambda ids, v: jnp.zeros((LC, 18)).at[ids].add(v, mode="drop")),
        sets, lambda o: o[0, 0])
    bench("scatter_add 80k->(8k,18)", jax.jit(
        lambda ids, v: jnp.zeros((WLC, 18)).at[ids].add(v, mode="drop")),
        wsets, lambda o: o[0, 0])

    # one-hot matmul segment-sum equivalent
    def onehot_sum(ids, v, lc):
        oh = (ids[:, None] == jnp.arange(lc)[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, v.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    bench("onehot_matmul 10k->(5k,18) bf16", jax.jit(
        lambda ids, v: onehot_sum(ids, v, LC)), sets, lambda o: o[0, 0])
    bench("onehot_matmul 80k->(8k,18) bf16", jax.jit(
        lambda ids, v: onehot_sum(ids, v, WLC)), wsets, lambda o: o[0, 0])

    # sort-based segment sum: sort by id, cumsum, boundary diff
    def sorted_segsum(ids, v, lc):
        order = jnp.argsort(ids)
        vs = v[order]
        cs = jnp.cumsum(vs, axis=0)
        ids_s = ids[order]
        # last position of each segment
        last = jnp.zeros((lc,), jnp.int32).at[ids_s].set(
            jnp.arange(ids.shape[0], dtype=jnp.int32), mode="drop")
        tot = cs[last]
        prev = jnp.concatenate([jnp.zeros((1, v.shape[1])), cs[:-1]])
        has = jnp.zeros((lc,), bool).at[ids_s].set(True, mode="drop")
        first = jnp.full((lc,), 0, jnp.int32).at[ids_s[::-1]].set(
            jnp.arange(ids.shape[0] - 1, -1, -1, dtype=jnp.int32),
            mode="drop")
        return jnp.where(has[:, None], tot - prev[first], 0.0)
    bench("sorted_segsum 10k->(5k,18)", jax.jit(
        lambda ids, v: sorted_segsum(ids, v, LC)), sets, lambda o: o[0, 0])

    # general 2D gather (the ORB patch pattern): 1250 x 33x33 from 480x640
    img = [jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
           for _ in range(6)]
    uvs = [jnp.asarray(np.stack([rng.integers(20, 620, 1250),
                                 rng.integers(20, 460, 1250)], -1),
                       jnp.int32) for _ in range(6)]
    def patch_gather(im, uv):
        y = uv[:, 1]; x = uv[:, 0]
        d = jnp.arange(-16, 17)
        return im[y[:, None, None] + d[None, :, None],
                  x[:, None, None] + d[None, None, :]]
    bench("gather 1250x33x33 (2d adv idx)", jax.jit(patch_gather),
          list(zip(img, uvs)), lambda o: o[0, 0, 0])

    def patch_onehot(im, uv):
        H, W = im.shape
        y = uv[:, 1]; x = uv[:, 0]
        d = jnp.arange(-16, 17)
        ry = y[:, None] + d[None, :]                     # (K,33)
        rx = x[:, None] + d[None, :]
        Py = (ry[..., None] == jnp.arange(H)).astype(jnp.bfloat16)
        Px = (rx[..., None] == jnp.arange(W)).astype(jnp.bfloat16)
        rows = jnp.einsum('kph,hw->kpw', Py, im.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return jnp.einsum('kpw,kqw->kpq', rows.astype(jnp.bfloat16), Px,
                          preferred_element_type=jnp.float32)
    bench("gather 1250x33x33 (one-hot mm bf16)", jax.jit(patch_onehot),
          list(zip(img, uvs)), lambda o: o[0, 0, 0])

    # flat point gather (direct BRIEF sampling): (K,512) from flat image
    idxs = [jnp.asarray(rng.integers(0, 480 * 640, (1250, 512)), jnp.int32)
            for _ in range(6)]
    bench("gather 1250x512 flat take", jax.jit(
        lambda im, ix: jnp.take(im.reshape(-1), ix)),
        list(zip(img, idxs)), lambda o: o[0, 0])

    # row gather from small table (BA back-sub pattern): (80000,) rows of 3
    tabs = [jnp.asarray(rng.normal(size=(WLC, 3)), jnp.float32)
            for _ in range(6)]
    rids = [jnp.asarray(rng.integers(0, WLC, (WOBS,)), jnp.int32)
            for _ in range(6)]
    bench("row gather 80k from (8k,3)", jax.jit(
        lambda t, ix: t[ix]), list(zip(tabs, rids)), lambda o: o[0, 0])

    # sort / unique / top_k
    keys = [jnp.asarray(rng.integers(0, 8192, (10000,)), jnp.int32)
            for _ in range(6)]
    bench("argsort 10k int32", jax.jit(lambda k: jnp.argsort(k)),
          [(k,) for k in keys], lambda o: o[0])
    bench("unique size=5000", jax.jit(
        lambda k: jnp.unique(k, size=5000, fill_value=8192)),
        [(k,) for k in keys], lambda o: o[0])
    scores = [jnp.asarray(rng.uniform(0, 50, (256, 1200)), jnp.float32)
              for _ in range(6)]
    bench("top_k (256,1200) k=4", jax.jit(
        lambda s: jax.lax.top_k(s, 4)[0]), [(s,) for s in scores],
        lambda o: o[0, 0])
    flats = [jnp.asarray(rng.uniform(0, 50, (307200,)), jnp.float32)
             for _ in range(6)]
    bench("top_k 307k k=313", jax.jit(
        lambda s: jax.lax.top_k(s, 313)[0]), [(s,) for s in flats],
        lambda o: o[0])


if __name__ == "__main__":
    main()
