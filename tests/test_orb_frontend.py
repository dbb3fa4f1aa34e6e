"""ORB front end: FAST vs cv2 oracle, pyramid/blur parity, descriptor
invariance and matching behaviour."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from send_slam_tpu.config import OrbConfig
from send_slam_tpu.ops.fast import fast_score_map, nms3x3
from send_slam_tpu.ops.hamming import (
    hamming_matrix, match_descriptors, pack_bits_to_u32,
    projection_window_mask, unpack_u32_to_bits,
)
from send_slam_tpu.ops.orb import extract_orb
from send_slam_tpu.ops.pyramid import build_pyramid, gaussian_blur, level_shapes

RNG = np.random.default_rng(7)


def checker_texture(h=240, w=320, seed=7):
    """Random blobby texture with real corners (not pure noise)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(150):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        bh, bw = rng.integers(4, 18, 2)
        img[y:y + bh, x:x + bw] = rng.uniform(30, 255)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img.astype(np.float32)


class TestPyramidBlur:
    def test_level_shapes(self):
        # Exact 6:5 per level at the default 1.2 (bit-identical
        # strided-slice resample; up to 5 px cropped at bottom/right).
        shapes = level_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 530)
        assert len(shapes) == 8
        for (h0, w0), (h1, w1) in zip(shapes, shapes[1:]):
            assert h1 == (h0 // 6) * 5 and w1 == (w0 // 6) * 5

    def test_gaussian_blur_matches_cv2(self):
        img = checker_texture()
        ours = np.asarray(gaussian_blur(jnp.asarray(img), 2.0, 7))
        ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, ref, atol=1e-2)

    def test_pyramid_levels_match_cv2(self):
        """Each level equals cv2 INTER_LINEAR of the (cropped) previous
        level: same half-pixel sampling once the ratio is exactly 6/5."""
        img = checker_texture()
        levels = build_pyramid(jnp.asarray(img), 4, 1.2)
        prev = img
        for i in range(1, 4):
            h, w = levels[i].shape
            used = prev[: (h // 5) * 6, : (w // 5) * 6]
            ref = cv2.resize(used, (w, h), interpolation=cv2.INTER_LINEAR)
            diff = np.abs(np.asarray(levels[i]) - ref)
            assert np.median(diff) < 0.05, (i, np.median(diff))
            assert diff.max() < 1.0, (i, diff.max())
            prev = np.asarray(levels[i])

    def test_pyramid_bit_exact_vs_numpy_spec(self):
        """The exact-1.2 path is pure elementwise f32 (never a resize
        matmul): it must be BIT-identical to a straight numpy f32
        rendition of the same 5-phase arithmetic. Elementwise IEEE f32
        is deterministic on every backend, so this equality is exactly
        the TPU==CPU level-image guarantee the basin-divergence fix
        rests on."""
        img = checker_texture()
        levels = build_pyramid(jnp.asarray(img), 4, 1.2)

        def down65(a):
            h, w = a.shape
            q6 = (h // 6) * 6
            g = a[:q6].reshape(-1, 6, w)
            rows = np.stack(
                [(np.float32(1.0 - wt) * g[:, o, :]
                  + np.float32(wt) * g[:, o + 1, :]).astype(np.float32)
                 for (o, wt) in ((0, 0.1), (1, 0.3), (2, 0.5),
                                 (3, 0.7), (4, 0.9))], 1)
            a = rows.reshape(-1, w)
            h2 = a.shape[0]
            p6 = (w // 6) * 6
            g = a[:, :p6].reshape(h2, -1, 6)
            cols = np.stack(
                [(np.float32(1.0 - wt) * g[:, :, o]
                  + np.float32(wt) * g[:, :, o + 1]).astype(np.float32)
                 for (o, wt) in ((0, 0.1), (1, 0.3), (2, 0.5),
                                 (3, 0.7), (4, 0.9))], 2)
            return cols.reshape(h2, -1)

        ref = img.astype(np.float32)
        for i in range(1, 4):
            ref = down65(ref)
            assert np.array_equal(np.asarray(levels[i]), ref), i


class TestFast:
    def test_corner_set_matches_cv2_exactly(self):
        """Pre-NMS, our arc-9 corner test must agree with cv2.FAST."""
        img = checker_texture().astype(np.uint8).astype(np.float32)
        score = np.asarray(fast_score_map(jnp.asarray(img), 20.0))
        ours = set(zip(*np.nonzero(score > 0)))
        ours = {(y, x) for (y, x) in ours if 5 <= y < 235 and 5 <= x < 315}

        det = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=False,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        kps = det.detect(img.astype(np.uint8))
        ref = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}
        ref = {(y, x) for (y, x) in ref if 5 <= y < 235 and 5 <= x < 315}
        assert ref, "oracle found no corners — bad fixture"
        assert ours == ref, (len(ours - ref), len(ref - ours))

    def test_nms_keeps_cv2_corners(self):
        """Post-NMS sets can differ (our score formula is the arc-min
        bound, OpenCV's cornerScore differs slightly) but must still
        cover cv2's surviving corners to within 1 px."""
        img = checker_texture().astype(np.uint8).astype(np.float32)
        score = np.asarray(nms3x3(fast_score_map(jnp.asarray(img), 20.0)))
        ours = set(zip(*np.nonzero(score > 0)))

        det = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        kps = det.detect(img.astype(np.uint8))
        ref = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps
               if 5 <= k.pt[1] < 235 and 5 <= k.pt[0] < 315}

        def near(p, s):
            y, x = p
            return any((y + dy, x + dx) in s for dy in (-1, 0, 1) for dx in (-1, 0, 1))

        recall = sum(near(p, ours) for p in ref) / len(ref)
        assert recall > 0.9, recall

    def test_no_corners_on_flat_image(self):
        img = jnp.full((64, 64), 100.0)
        score = fast_score_map(img, 20.0)
        assert float(jnp.max(score)) == 0.0


@pytest.fixture(scope="module")
def orb_cfg():
    return OrbConfig(n_features=512, n_levels=4)


@pytest.fixture(scope="module")
def extract_jit(orb_cfg):
    return jax.jit(lambda im: extract_orb(im, orb_cfg))


class TestExtract:
    def test_shapes_and_capacity(self, orb_cfg, extract_jit):
        img = jnp.asarray(checker_texture())
        f = extract_jit(img)
        N = orb_cfg.n_features
        assert f.uv.shape == (N, 2)
        assert f.desc.shape == (N, 8) and f.desc.dtype == jnp.uint32
        assert f.valid.shape == (N,)
        assert int(f.num_valid()) > 100

    def test_deterministic(self, extract_jit):
        img = jnp.asarray(checker_texture())
        f1 = extract_jit(img)
        f2 = extract_jit(img)
        assert np.array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
        assert np.array_equal(np.asarray(f1.uv), np.asarray(f2.uv))

    def test_keypoints_within_bounds(self, orb_cfg, extract_jit):
        img = jnp.asarray(checker_texture())
        f = extract_jit(img)
        uv = np.asarray(f.uv)[np.asarray(f.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 320).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 240).all()

    def test_self_matching_is_identity(self, extract_jit):
        img = jnp.asarray(checker_texture())
        f = extract_jit(img)
        m = match_descriptors(f.desc, f.desc, f.valid, f.valid,
                              max_dist=10, ratio=1.01, mutual=True)
        idx = np.asarray(m.idx)
        valid = np.asarray(m.valid)
        n_valid = int(np.asarray(f.valid).sum())
        agree = (idx[valid] == np.nonzero(valid)[0]).mean()
        assert valid.sum() > 0.9 * n_valid
        assert agree > 0.99

    def test_matching_across_translation(self, extract_jit):
        img = checker_texture()
        shifted = np.roll(img, 7, axis=1)  # shift x by +7
        fa = extract_jit(jnp.asarray(img))
        fb = extract_jit(jnp.asarray(shifted))
        m = match_descriptors(fa.desc, fb.desc, fa.valid, fb.valid,
                              max_dist=64, ratio=0.9, mutual=True,
                              angles_a=fa.angle, angles_b=fb.angle)
        valid = np.asarray(m.valid)
        assert valid.sum() > 50
        duv = np.asarray(fb.uv)[np.asarray(m.idx)[valid]] - np.asarray(fa.uv)[valid]
        med = np.median(duv, axis=0)
        assert abs(med[0] - 7) < 1.5, med
        assert abs(med[1]) < 1.5, med

    def test_rotation_invariance(self, extract_jit):
        img = checker_texture()
        M = cv2.getRotationMatrix2D((160, 120), 30, 1.0)
        rot = cv2.warpAffine(img, M, (320, 240))
        fa = extract_jit(jnp.asarray(img))
        fb = extract_jit(jnp.asarray(rot))
        m = match_descriptors(fa.desc, fb.desc, fa.valid, fb.valid,
                              max_dist=64, ratio=0.9, mutual=True)
        valid = np.asarray(m.valid)
        assert valid.sum() > 30, valid.sum()
        # Matched pairs should respect the known rotation.
        uva = np.asarray(fa.uv)[valid]
        uvb = np.asarray(fb.uv)[np.asarray(m.idx)[valid]]
        pred = uva @ M[:, :2].T + M[:, 2]
        err = np.linalg.norm(pred - uvb, axis=1)
        assert np.median(err) < 2.0, np.median(err)


class TestHamming:
    def test_matrix_matches_numpy_popcount(self):
        a = RNG.integers(0, 2**32, (37, 8), dtype=np.uint32)
        b = RNG.integers(0, 2**32, (53, 8), dtype=np.uint32)
        ours = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        xor = a[:, None, :] ^ b[None, :, :]
        ref = np.unpackbits(xor.view(np.uint8), axis=-1).sum(-1)
        np.testing.assert_array_equal(ours.astype(np.int64), ref)

    def test_pack_unpack_roundtrip(self):
        d = RNG.integers(0, 2**32, (16, 8), dtype=np.uint32)
        bits = unpack_u32_to_bits(jnp.asarray(d), dtype=jnp.float32)
        back = pack_bits_to_u32(bits)
        assert np.array_equal(np.asarray(back), d)

    def test_projection_window_mask(self):
        pred = jnp.asarray([[0.0, 0.0], [100.0, 100.0]])
        kp = jnp.asarray([[3.0, 4.0], [100.0, 108.0], [0.0, 0.0]])
        m = np.asarray(projection_window_mask(pred, kp, radius=5.0))
        assert m.tolist() == [[True, False, True], [False, False, False]]
