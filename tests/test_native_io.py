"""Native host-I/O library vs numpy reference implementations."""

import struct

import numpy as np
import pytest

from send_slam_tpu.io import native, ppm

RNG = np.random.default_rng(12)


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "native hostio failed to build"


class TestNativePpm:
    def test_decode_gray_matches_numpy(self):
        img = RNG.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        data = ppm.encode_ppm(img)
        got = native.decode_ppm_gray(data)
        ref = ppm.rgb_to_gray_u8(img)
        assert np.max(np.abs(got.astype(int) - ref.astype(int))) <= 1

    def test_decode_p5(self):
        img = RNG.integers(0, 255, (20, 30), dtype=np.uint8)
        data = ppm.encode_ppm(img)
        assert np.array_equal(native.decode_ppm_gray(data), img)

    def test_encode_roundtrip(self):
        img = RNG.integers(0, 255, (16, 24, 3), dtype=np.uint8)
        data = native.encode_ppm(img)
        assert np.array_equal(ppm.decode_ppm(data), img)

    def test_rgb_to_gray_matches(self):
        img = np.ascontiguousarray(
            RNG.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        got = native.rgb_to_gray(img)
        ref = ppm.rgb_to_gray_u8(img)
        assert np.max(np.abs(got.astype(int) - ref.astype(int))) <= 1

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            native.decode_ppm_gray(b"not a ppm at all")


class TestNativeFraming:
    def test_extract_packets(self):
        bodies = [b"hello", b"", b"x" * 1000]
        stream = b"".join(struct.pack(">I", len(b)) + b for b in bodies)
        # Add a partial tail.
        stream += struct.pack(">I", 10) + b"abc"
        got, consumed = native.extract_packets_native(stream)
        assert got == bodies
        assert consumed == sum(4 + len(b) for b in bodies)

    def test_guard(self):
        stream = struct.pack(">I", 60 * 1024 * 1024) + b"x"
        with pytest.raises(ValueError):
            native.extract_packets_native(stream)

    def test_empty(self):
        got, consumed = native.extract_packets_native(b"\x00\x00")
        assert got == [] and consumed == 0
