"""send_slam_tpu — a TPU-native monocular SLAM engine.

A from-scratch rebuild of the capabilities of SEND-SLAM
(reference: /root/reference, SoloFausto/SEND-SLAM): camera/video frame
ingestion, browser checkerboard calibration, real-time monocular visual
SLAM, and a live pose stream over WebSockets — with the SLAM algorithm
itself (ORB features, Hamming matching, tracking, local bundle
adjustment, loop closing) implemented natively for TPU with
JAX / XLA / Pallas instead of the reference's dockerized C++ ORB-SLAM3
backend (reference: slam_backends/orb_slam_3/orbslam3_mono_networked.cc).

Layout
------
- ``geometry/``  SO3/SE3/Sim3, camera models, triangulation, epipolar
- ``ops/``       image pyramid, FAST, ORB descriptors, Hamming matching
                 (pure-JAX reference paths + Pallas TPU kernels)
- ``models/``    frame/map state, initializer, tracker, local mapping,
                 loop closing, the System facade
- ``calib/``     checkerboard detection + Zhang calibration
- ``io/``        wire protocol (length-prefixed MessagePack), PPM,
                 datasets, trajectory I/O
- ``server/``    the :4000 web panel / client WS + :5000 TCP compat
- ``parallel/``  device-mesh utilities, multi-camera shard_map
- ``utils/``     profiling, masked top-k helpers
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls truncate f32 operands to bf16 under the 'default'
# precision — px-scale errors in projections / GN normal equations /
# triangulation that destabilize tracking (bf16's 8-bit mantissa is
# ~0.4% relative error; geometry needs f32). The descriptor-matching
# matmul is unaffected (its 0/1 operands are exact in bf16 anyway).
_jax.config.update("jax_default_matmul_precision", "highest")
