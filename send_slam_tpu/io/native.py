"""ctypes bindings for the native host-I/O library (native/hostio.cc).

Auto-builds the shared library on first use (make -C native) and falls
back to the pure-numpy implementations in io/ppm.py when the toolchain
is unavailable. ``decode_ppm_gray``/``extract_packets_native`` are the
hot host-side per-frame calls.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ppm_probe.restype = ctypes.c_int
        lib.ppm_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ppm_decode_gray.restype = ctypes.c_int
        lib.ppm_decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_int]
        lib.rgb_to_gray.restype = None
        lib.rgb_to_gray.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
        lib.ppm_encode.restype = ctypes.c_long
        lib.ppm_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long]
        lib.extract_packets.restype = ctypes.c_int
        lib.extract_packets.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
        _lib = lib
        log.info("native hostio loaded: %s", _LIB_PATH)
    except Exception as e:
        log.warning("native hostio unavailable (%s); using numpy fallback", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_ppm_gray(data: bytes) -> np.ndarray:
    """Binary PPM/PGM bytes -> (H, W) uint8 grayscale (fused luma)."""
    lib = _load()
    if lib is None:
        from send_slam_tpu.io.ppm import decode_ppm, rgb_to_gray_u8
        img = decode_ppm(data)
        return rgb_to_gray_u8(img) if img.ndim == 3 else img
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.ppm_probe(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise ValueError("not a binary PPM/PGM")
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.ppm_decode_gray(data, len(data),
                             out.ctypes.data_as(ctypes.c_void_p), out.size)
    if rc != 0:
        raise ValueError(f"ppm decode failed: {rc}")
    return out


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None or not rgb.flags.c_contiguous:
        from send_slam_tpu.io.ppm import rgb_to_gray_u8
        return rgb_to_gray_u8(rgb)
    n = rgb.shape[0] * rgb.shape[1]
    out = np.empty(rgb.shape[:2], np.uint8)
    lib.rgb_to_gray(rgb.ctypes.data_as(ctypes.c_void_p), n,
                    out.ctypes.data_as(ctypes.c_void_p))
    return out


def encode_ppm(img: np.ndarray) -> bytes:
    lib = _load()
    if lib is None or not img.flags.c_contiguous:
        from send_slam_tpu.io.ppm import encode_ppm as np_encode
        return np_encode(img)
    channels = 3 if img.ndim == 3 else 1
    cap = img.size + 64
    out = np.empty(cap, np.uint8)
    n = lib.ppm_encode(img.ctypes.data_as(ctypes.c_void_p),
                       img.shape[1], img.shape[0], channels,
                       out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        raise ValueError("ppm encode failed")
    return out[:n].tobytes()


def extract_packets_native(
    buf: bytes, max_packets: int = 64,
    max_packet_len: int = 50 * 1024 * 1024,
) -> Tuple[List[bytes], int]:
    """Scan for complete length-prefixed packets. Returns (bodies,
    consumed_bytes); the caller retains buf[consumed:]."""
    lib = _load()
    if lib is None:
        # numpy/struct fallback with identical semantics.
        import struct
        bodies, pos = [], 0
        while len(bodies) < max_packets and pos + 4 <= len(buf):
            (plen,) = struct.unpack(">I", buf[pos:pos + 4])
            if plen > max_packet_len:
                raise ValueError("packet exceeds guard")
            if pos + 4 + plen > len(buf):
                break
            bodies.append(buf[pos + 4: pos + 4 + plen])
            pos += 4 + plen
        return bodies, pos
    offsets = (ctypes.c_size_t * max_packets)()
    lengths = (ctypes.c_size_t * max_packets)()
    consumed = ctypes.c_size_t()
    n = lib.extract_packets(buf, len(buf), offsets, lengths, max_packets,
                            max_packet_len, ctypes.byref(consumed))
    if n < 0:
        raise ValueError("packet exceeds guard")
    bodies = [buf[offsets[i]: offsets[i] + lengths[i]] for i in range(n)]
    return bodies, consumed.value
