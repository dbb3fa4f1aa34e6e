"""Pallas kernels vs their jnp oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from send_slam_tpu.ops.fast import fast_score_map
from send_slam_tpu.ops.pallas.fast_kernel import fast_score_map_pallas


def texture(h, w, seed=3):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(80):
        y, x = rng.integers(0, h - 12), rng.integers(0, w - 12)
        img[y:y + rng.integers(3, 10), x:x + rng.integers(3, 10)] = \
            rng.uniform(40, 250)
    return img


class TestFastKernel:
    def test_matches_jnp_reference(self):
        img = texture(120, 160)
        ref = np.asarray(fast_score_map(jnp.asarray(img), 20.0))
        got = np.asarray(fast_score_map_pallas(
            jnp.asarray(img), 20.0, interpret=True))
        # Interior only: the reference pads with edge mode from the
        # true border; the kernel's tile halos see identical values.
        np.testing.assert_allclose(got[4:-4, 4:-4], ref[4:-4, 4:-4],
                                   atol=1e-5)

    def test_ragged_height(self):
        img = texture(100, 128)  # 100 not divisible by tile height
        ref = np.asarray(fast_score_map(jnp.asarray(img), 12.0))
        got = np.asarray(fast_score_map_pallas(
            jnp.asarray(img), 12.0, interpret=True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got[4:-4, 4:-4], ref[4:-4, 4:-4],
                                   atol=1e-5)

    def test_fused_nms_matches_reference(self):
        from send_slam_tpu.ops.fast import nms3x3
        img = texture(120, 160, seed=5)
        ref = np.asarray(nms3x3(fast_score_map(jnp.asarray(img), 12.0)))
        got = np.asarray(fast_score_map_pallas(
            jnp.asarray(img), 12.0, interpret=True, with_nms=True))
        np.testing.assert_allclose(got[4:-4, 4:-4], ref[4:-4, 4:-4],
                                   atol=1e-5)

    def test_vmap_batches_onto_batched_grid(self):
        """vmap(fast_score_map_pallas) must be BIT-identical to the
        single-image kernel per batch row: the custom batching rule
        maps one vmap level onto the (B, n_tiles) grid — the generic
        pallas rule cannot block an ANY-space manually-DMA'd operand
        and failed to lower on the real chip (multicam's per-lane
        vmap over make_frame, round-5 TPU lane run)."""
        imgs = jnp.stack([jnp.asarray(texture(120, 160, seed=s))
                          for s in (1, 2, 3)])
        for nms in (False, True):
            batched = np.asarray(jax.vmap(
                lambda x: fast_score_map_pallas(
                    x, 14.0, interpret=True, with_nms=nms))(imgs))
            for k in range(imgs.shape[0]):
                single = np.asarray(fast_score_map_pallas(
                    imgs[k], 14.0, interpret=True, with_nms=nms))
                np.testing.assert_array_equal(batched[k], single)
