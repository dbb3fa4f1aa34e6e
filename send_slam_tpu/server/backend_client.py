"""Backend role: drop-in TPU replacement for the reference's dockerized
ORB-SLAM3 container.

Mirrors orbslam3_mono_networked.cc as a protocol peer: dial the host
(``ORB_SLAM3_WS_PORT``-style port config, …cc:346-370), consume
``calibration``/``frame``/``terminate`` packets, run the TPU engine,
and send a ``pose`` packet per successfully tracked frame (Twc,
tracking_state — …cc:225-282, emitted only when tracking is OK,
…cc:595-599). A user of the reference can stop the docker container
and run ``python -m send_slam_tpu.server.backend_client`` instead.
"""

from __future__ import annotations

import asyncio
import logging
import os
from typing import Optional

import numpy as np

from send_slam_tpu.config import CameraConfig, EngineConfig
from send_slam_tpu.io.ppm import rgb_to_gray_u8
from send_slam_tpu.io.protocol import (
    PacketDecoder, TRACKING_OK, build_pose_packet, frame_packet_bytes,
)
from send_slam_tpu.models.system import System

log = logging.getLogger(__name__)


def _decode_frame(pkt: dict) -> Optional[np.ndarray]:
    data = pkt.get("frame")
    if data is None:
        data = pkt.get("image")
    if data is None:
        return None
    enc = pkt.get("encoding", "ppm")
    if enc == "ppm":
        # Fused native decode+luma when the hostio library is built.
        from send_slam_tpu.io import native
        try:
            return native.decode_ppm_gray(data)
        except ValueError:
            return None
    else:
        # JPEG/PNG fallback via cv2 (the reference backend uses
        # cv::imdecode IMREAD_UNCHANGED for the same reason, …cc:546).
        import cv2
        arr = np.frombuffer(data, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_UNCHANGED)
        if img is None:
            return None
        if img.ndim == 3:
            img = img[..., ::-1]
    if img.ndim == 3:
        img = rgb_to_gray_u8(img)
    return img


def _config_from_calibration(pkt: dict) -> EngineConfig:
    cam = pkt["camera"]
    return EngineConfig(camera=CameraConfig(
        width=int(cam["width"]), height=int(cam["height"]),
        fx=float(cam["fx"]), fy=float(cam["fy"]),
        cx=float(cam["cx"]), cy=float(cam["cy"]),
        k1=float(cam.get("k1", 0.0)), k2=float(cam.get("k2", 0.0)),
        p1=float(cam.get("p1", 0.0)), p2=float(cam.get("p2", 0.0)),
        k3=float(cam.get("k3", 0.0)), fps=float(cam.get("fps", 30.0)),
    ))


class BackendClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 5000,
                 config_factory=None):
        self.host = host
        self.port = port
        self.system: Optional[System] = None
        # Overridable for tests / custom capacities; default derives the
        # config from the received calibration packet.
        self._config_factory = config_factory or _config_from_calibration
        self.frames_seen = 0

    async def run(self) -> None:
        reader, writer = await asyncio.open_connection(self.host, self.port)
        log.info("connected to host %s:%d", self.host, self.port)
        dec = PacketDecoder()
        loop = asyncio.get_running_loop()
        try:
            await self._serve(reader, writer, dec, loop)
        except (ConnectionResetError, BrokenPipeError):
            # Host hung up — treated as shutdown, like the reference
            # backend exiting on a closed socket (…cc:636-650).
            log.info("host connection lost; shutting down")
        finally:
            writer.close()

    async def _serve(self, reader, writer, dec, loop) -> None:
        try:
            while True:
                data = await reader.read(1 << 20)
                if not data:
                    return
                for pkt in dec.feed(data):
                    ptype = pkt.get("type")
                    if ptype in ("terminate", "shutdown"):
                        log.info("terminate received")
                        return
                    if ptype == "calibration":
                        # (Re)build the engine — the reference backend
                        # reconstructs ORB_SLAM3::System the same way,
                        # discarding the old map (…cc:477-519).
                        self.system = System(self._config_factory(pkt))
                        if os.environ.get("SLAM_SKIP_WARMUP") != "1":
                            await loop.run_in_executor(
                                None, lambda: self.system.warmup(
                                    image_dtype=np.float32))
                        log.info("engine initialized from calibration "
                                 "(programs compiled)")
                    elif ptype == "frame" and self.system is not None:
                        self.frames_seen += 1
                        gray = _decode_frame(pkt)
                        if gray is None:
                            continue
                        out = await loop.run_in_executor(
                            None, self.system.track_monocular,
                            gray.astype(np.float32),
                            float(pkt.get("timestamp", 0.0)))
                        if out.tracking_state == TRACKING_OK:
                            pose = build_pose_packet(
                                float(pkt.get("timestamp", 0.0)),
                                int(pkt.get("camera_id", 0)),
                                out.tracking_state, out.position,
                                out.orientation)
                            writer.write(frame_packet_bytes(pose))
                            await writer.drain()
        finally:
            writer.close()


def main() -> None:
    import argparse
    import os
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int,
                   default=int(os.environ.get("ORB_SLAM3_WS_PORT", "5000")))
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    asyncio.run(BackendClient(args.host, args.port).run())


if __name__ == "__main__":
    main()
