"""Test harness config: force an 8-device virtual CPU platform.

Must run before any test module imports jax: pytest imports conftest
first, and we mutate XLA_FLAGS before the first backend is built.
The axon (remote TPU) plugin registered by sitecustomize is skipped by
selecting the cpu platform — its initialization costs ~2 min of tunnel
handshake per process, which tests must not pay.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Server components skip the full System.warmup() pre-compile (minutes
# of XLA compiles on CPU for programs a smoke test never reaches);
# programs still compile lazily on first use.
os.environ.setdefault("SLAM_SKIP_WARMUP", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
