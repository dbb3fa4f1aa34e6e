"""Place-recognition retrieval: LSH bag-of-buckets frame signatures.

Replaces ORB-SLAM3's DBoW2 vocabulary + KeyFrameDatabase inverted index
(CMakeLists.txt:63,113 and the 145 MB ORBvoc.txt the reference backend
loads at …cc:344). Instead of an offline-trained vocabulary tree, each
256-bit descriptor is hashed by B seeded random hyperplanes over its
±1 bit vector into one of 2^B buckets; a frame's signature is its
L2-normalized bucket histogram and similarity is a dot product — so
scoring a query against every keyframe is one (MK, 2^B) @ (2^B,)
matvec. No vocabulary file, no training, fully on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.ops.hamming import unpack_u32_to_bits

N_PLANES = 10                 # 2^10 = 1024 buckets
N_BUCKETS = 1 << N_PLANES


@functools.lru_cache(maxsize=None)
def _hyperplanes(seed: int = 7, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(256, n_planes)).astype(np.float32)


def frame_signature(desc_u32: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(N,8) uint32 descriptors + (N,) validity -> (N_BUCKETS,) f32
    L2-normalized histogram signature."""
    bits = unpack_u32_to_bits(desc_u32, dtype=jnp.float32) * 2.0 - 1.0
    proj = bits @ jnp.asarray(_hyperplanes())             # (N, P)
    hash_bits = (proj > 0).astype(jnp.int32)
    weights = (1 << jnp.arange(N_PLANES, dtype=jnp.int32))[None, :]
    bucket = jnp.sum(hash_bits * weights, axis=1)         # (N,)
    onehot_idx = jnp.where(valid, bucket, N_BUCKETS)      # drop invalid
    hist = jnp.zeros((N_BUCKETS,), jnp.float32).at[onehot_idx].add(
        1.0, mode="drop")
    # Hellinger (sqrt) embedding before L2 normalization: repeated
    # texture inflates a few buckets far beyond their discriminative
    # value (descriptor burstiness); sqrt compresses heavy buckets so
    # the cosine compares bucket SUPPORT more than raw mass — the
    # standard burstiness fix in BoW retrieval, done here without any
    # vocabulary statistics.
    hist = jnp.sqrt(hist)
    return hist / jnp.maximum(jnp.linalg.norm(hist), 1e-9)


def retrieval_scores(signatures: jnp.ndarray, query: jnp.ndarray,
                     idf: jnp.ndarray = None) -> jnp.ndarray:
    """(MK, N_BUCKETS) database vs (N_BUCKETS,) query -> (MK,) cosine.

    idf: optional (N_BUCKETS,) weights (idf_weights): buckets hit by
    most keyframes (floor texture, repeated structure) stop dominating
    the score — DBoW2's tf-idf, recomputed on the fly from the live
    keyframe table instead of an offline corpus."""
    if idf is None:
        return signatures @ query
    wq = query * idf
    wk = signatures * idf[None, :]
    num = wk @ wq
    den = jnp.linalg.norm(wk, axis=1) * jnp.maximum(
        jnp.linalg.norm(wq), 1e-9)
    return num / jnp.maximum(den, 1e-9)


def idf_weights(signatures: jnp.ndarray,
                kf_valid: jnp.ndarray) -> jnp.ndarray:
    """(MK, N_BUCKETS) signatures + (MK,) validity -> (N_BUCKETS,)
    inverse-document-frequency weights over the LIVE keyframe set."""
    present = (signatures > 0) & kf_valid[:, None]
    df = jnp.sum(present.astype(jnp.float32), axis=0)
    n = jnp.maximum(jnp.sum(kf_valid.astype(jnp.float32)), 1.0)
    return jnp.log1p(n / (1.0 + df))
