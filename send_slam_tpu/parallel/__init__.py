"""Device-mesh parallelism: multi-camera sharded tracking.

The reference's concurrency is BEAM processes + a TCP hop to one C++
backend (SURVEY.md §2c); the protocol carries ``camera_id`` end-to-end
but only one producer ever runs. Here multi-camera is first-class: N
camera lanes are data-parallel shards over a ``jax.sharding.Mesh`` axis
("cam"), each running the full per-frame track step on its own chip,
with XLA collectives (psum) aggregating cross-camera statistics over
ICI — the BASELINE.json config-5 topology (two-camera multi-session
mapping with shared-map merge).
"""

from send_slam_tpu.parallel.mesh import make_mesh  # noqa: F401
from send_slam_tpu.parallel.multicam import (  # noqa: F401
    MultiCamState, init_multicam, multicam_slam_step,
    multicam_track_step,
)
