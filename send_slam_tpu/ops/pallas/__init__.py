"""Pallas TPU kernels for the hot front-end ops.

Each kernel has a pure-jnp twin in ops/ that serves as the numerics
oracle (tests run both paths); dispatch helpers pick the Pallas path on
TPU and the jnp path elsewhere.
"""

from send_slam_tpu.ops.pallas.fast_kernel import (  # noqa: F401
    fast_score_map_pallas,
)
