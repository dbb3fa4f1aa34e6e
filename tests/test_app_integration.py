"""Whole-application smoke test: video replay -> in-process engine ->
pose stream over ws://.../client + /metrics, the reference's end-to-end
contract (SURVEY.md §3.2) with the docker/TCP hop replaced by the
library call."""

import asyncio
import json
import os

import numpy as np
import pytest

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, ServerConfig,
    TrackingConfig,
)
from send_slam_tpu.server.app import Application
from send_slam_tpu.utils.synth import SyntheticWorld


def test_app_end_to_end(tmp_path):
    import cv2

    world = SyntheticWorld(n_points=600)
    ts, Rs, tls = world.trajectory(n_frames=30)
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    for k in range(30):
        img = world.render(Rs[k], tls[k]).astype(np.uint8)
        cv2.imwrite(str(seq_dir / f"frame_{k:06d}.png"), img)

    cfg = EngineConfig(
        orb=OrbConfig(n_features=512, n_levels=4),
        camera=CameraConfig(width=world.W, height=world.H,
                            fx=world.fx, fy=world.fy,
                            cx=world.cx, cy=world.cy, fps=60.0),
        map=MapConfig(max_keyframes=32, max_landmarks=2048, ba_window=4),
        tracking=TrackingConfig(init_min_matches=50),
        server=ServerConfig(http_port=0, tcp_port=0),
    )

    async def go():
        app = Application(
            config=cfg, video=str(seq_dir / "frame_%06d.png"),
            run_engine=True, run_tcp=True, run_web=True)
        await app.start()
        try:
            port = app.web._runner.addresses[0][1]
            import aiohttp
            async with aiohttp.ClientSession() as sess:
                # Pose stream on /client: wait for the first pose JSON.
                async with sess.ws_connect(
                        f"http://127.0.0.1:{port}/client") as ws:
                    msg = await asyncio.wait_for(ws.receive_str(), 240)
                    data = json.loads(msg)
                    assert data["type"] == "pose"
                    payload = data["payload"]
                    assert payload["tracking_state"] == 2
                    assert set(payload["position"]) == {"x", "y", "z"}
                # /metrics surfaces engine stats.
                async with sess.get(
                        f"http://127.0.0.1:{port}/metrics") as resp:
                    stats = await resp.json()
                    assert stats["frames"] > 0
                    assert stats["n_keyframes"] >= 2
                # Panel page served.
                async with sess.get(f"http://127.0.0.1:{port}/") as resp:
                    assert resp.status == 200
        finally:
            await app.stop()

    asyncio.run(asyncio.wait_for(go(), 600))
