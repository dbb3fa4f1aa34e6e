"""Device compute ops: pyramid, FAST, ORB, Hamming matching.

Pure-JAX reference implementations live beside Pallas TPU kernels
(``ops/pallas/``); every op has a jnp path that runs anywhere (and is
the numerics oracle for the kernels) and, where profitable, a fused
Pallas path selected at call time on TPU.
"""

from send_slam_tpu.ops.pyramid import build_pyramid, gaussian_blur  # noqa: F401
from send_slam_tpu.ops.fast import fast_score_map  # noqa: F401
from send_slam_tpu.ops.orb import extract_orb, FrameFeatures  # noqa: F401
from send_slam_tpu.ops.hamming import (  # noqa: F401
    hamming_matrix, pack_bits_to_u32, unpack_u32_to_bits, match_descriptors,
)
