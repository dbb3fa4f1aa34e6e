"""Micro-profile of the BA inner-iteration pieces on TPU, to locate
the cost in local_bundle_adjustment (W=8, N=1250, ML=8192)."""

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

from send_slam_tpu.ops.segsum import ObsMap

W, N, ML = 8, 1250, 8192
R = W * N


def bench(name, fn, inputs, leaf, n=10):
    out = fn(*inputs[0])
    np.asarray(leaf(out))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*inputs[i % len(inputs)])
    np.asarray(leaf(out))
    per = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {per:8.2f} ms/call", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    idss = [jnp.asarray(rng.integers(0, ML, (R,)), jnp.int32)
            for _ in range(4)]
    vals12 = [jnp.asarray(rng.normal(size=(R, 12)), jnp.float32)
              for _ in range(4)]
    vals18 = [jnp.asarray(rng.normal(size=(W, N, 18)), jnp.float32)
              for _ in range(4)]
    tabs = [jnp.asarray(rng.normal(size=(ML, 3)), jnp.float32)
            for _ in range(4)]
    Hlls = [jnp.asarray(
        np.eye(3)[None] * 2 + 0.1 * rng.normal(size=(ML, 3, 3)),
        jnp.float32) for _ in range(4)]
    Hpls = [jnp.asarray(rng.normal(size=(W, ML, 6, 3)), jnp.float32)
            for _ in range(4)]
    Hinvs = [jnp.asarray(rng.normal(size=(ML, 3, 3)), jnp.float32)
             for _ in range(4)]
    Js = [jnp.asarray(rng.normal(size=(W, N, 2, 6)), jnp.float32)
          for _ in range(4)]
    wgts = [jnp.asarray(rng.uniform(0, 1, (W, N)), jnp.float32)
            for _ in range(4)]

    bench("onehot build (10k,8k)", jax.jit(
        lambda ids: (ids[:, None] == jnp.arange(ML)[None, :])
        .astype(jnp.bfloat16)), [(i,) for i in idss], lambda o: o[0, 0])

    oms = [ObsMap(i, ML) for i in idss]
    jax.block_until_ready([om.oh_t for om in oms])

    k = [0]
    def seg12(v):
        k[0] += 1
        return oms[k[0] % 4].seg_sum(v)
    bench("seg_sum (10k,12)->(8k,12)", jax.jit(seg12), [(v,) for v in vals12],
          lambda o: o[0, 0])

    def segb(v):
        k[0] += 1
        return oms[k[0] % 4].seg_sum_batched(v)
    bench("seg_sum_batched (8,1250,18)", jax.jit(segb),
          [(v,) for v in vals18], lambda o: o[0, 0, 0])

    def gath(t):
        k[0] += 1
        return oms[k[0] % 4].gather(t)
    bench("gather (8k,3)->(10k,3) exact", jax.jit(gath),
          [(t,) for t in tabs], lambda o: o[0, 0])

    bench("batched inv (8k,3,3)", jax.jit(
        lambda H: jnp.linalg.inv(H)), [(h,) for h in Hlls],
        lambda o: o[0, 0, 0])

    def adjugate_inv(H):
        # closed-form 3x3 inverse, elementwise over the batch
        a, b, c = H[:, 0, 0], H[:, 0, 1], H[:, 0, 2]
        d, e, f = H[:, 1, 0], H[:, 1, 1], H[:, 1, 2]
        g, h, i = H[:, 2, 0], H[:, 2, 1], H[:, 2, 2]
        A = e * i - f * h
        B = c * h - b * i
        C = b * f - c * e
        D = f * g - d * i
        E = a * i - c * g
        F = c * d - a * f
        G = d * h - e * g
        Hc = b * g - a * h
        I = a * e - b * d
        det = a * A + b * D + c * G
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        out = jnp.stack([
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, Hc, I], -1),
        ], -2)
        return out * inv_det[:, None, None]
    bench("adjugate inv (8k,3,3)", jax.jit(adjugate_inv),
          [(h,) for h in Hlls], lambda o: o[0, 0, 0])

    bench("T einsum wlab,lbc->wlac", jax.jit(
        lambda Hpl, Hi: jnp.einsum('wlab,lbc->wlac', Hpl, Hi)),
        list(zip(Hpls, Hinvs)), lambda o: o[0, 0, 0, 0])

    Ts = [jnp.asarray(rng.normal(size=(W, ML, 6, 3)), jnp.float32)
          for _ in range(4)]
    bench("S einsum wlac,vlbc->wvab", jax.jit(
        lambda T, Hpl: jnp.einsum('wlac,vlbc->wvab', T, Hpl)),
        list(zip(Ts, Hpls)), lambda o: o[0, 0, 0, 0])

    bench("J blocks einsum (W,N,2,6)", jax.jit(
        lambda J, w: (jnp.einsum('wnia,wn,wnib->wab', J, w, J),
                      jnp.einsum('wnia,wn,wnib->wnab', J, w,
                                 J[..., :3]))),
        list(zip(Js, wgts)), lambda o: o[0][0, 0, 0])

    # ML-last layout variants
    Hpl_T = [jnp.asarray(rng.normal(size=(W, 6, 3, ML)), jnp.float32)
             for _ in range(4)]
    Hinv_T = [jnp.asarray(rng.normal(size=(3, 3, ML)), jnp.float32)
              for _ in range(4)]

    def T_mllast(Hpl, Hi):
        # T[w,a,c,l] = sum_b Hpl[w,a,b,l] * Hi[b,c,l]
        return jnp.einsum('wabl,bcl->wacl', Hpl, Hi)
    bench("T einsum ML-last", jax.jit(T_mllast),
          list(zip(Hpl_T, Hinv_T)), lambda o: o[0, 0, 0, 0])

    Ts_T = [jnp.asarray(rng.normal(size=(W, 6, 3, ML)), jnp.float32)
            for _ in range(4)]
    def S_mllast(T, Hpl):
        A = T.reshape(W * 6, 3 * ML)
        B = Hpl.reshape(W * 6, 3 * ML)
        return A @ B.T
    bench("S matmul ML-last (48,24k)@(24k,48)", jax.jit(S_mllast),
          list(zip(Ts_T, Hpl_T)), lambda o: o[0, 0])


if __name__ == "__main__":
    main()
