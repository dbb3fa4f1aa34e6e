"""HTTP + WebSocket server on :4000.

The reference contract (web_server.ex:7-29):
- ``GET /``        -> panel HTML page
- ``GET /panel``   -> WS: binary JPEG frames down; JSON
                      {"calibrationFrames": [b64...]} up, replied with
                      "OK"/"ERROR" (web_socket_handler.ex:25-52)
- ``GET /client``  -> WS: {"type": "pose", "payload": {...}} JSON per
                      pose (client_application_server.ex:16-19)
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
import os
from typing import Optional

import numpy as np
from aiohttp import WSMsgType, web

from send_slam_tpu.io.protocol import pose_ws_json
from send_slam_tpu.server import bus as topics
from send_slam_tpu.server.bus import Bus
from send_slam_tpu.server.producers import FrameEvent

log = logging.getLogger(__name__)

WEB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "web")


def _encode_jpeg(rgb: np.ndarray) -> bytes:
    import cv2
    ok, buf = cv2.imencode(".jpg", rgb[..., ::-1])
    return buf.tobytes() if ok else b""


class WebPanel:
    def __init__(self, bus: Bus, host: str = "0.0.0.0", port: int = 4000,
                 metrics_fn=None):
        self.bus = bus
        self.host = host
        self.port = port
        self.metrics_fn = metrics_fn
        self.app = web.Application()
        self.app.router.add_get("/", self.index)
        self.app.router.add_get("/panel", self.panel_ws)
        self.app.router.add_get("/client", self.client_ws)
        self.app.router.add_get("/metrics", self.metrics)
        self._runner: Optional[web.AppRunner] = None

    async def start(self) -> None:
        self._runner = web.AppRunner(self.app)
        await self._runner.setup()
        site = web.TCPSite(self._runner, self.host, self.port)
        await site.start()
        log.info("web panel on http://%s:%d", self.host, self.port)

    async def stop(self) -> None:
        if self._runner:
            await self._runner.cleanup()

    # ------------------------------------------------------------------

    async def index(self, request: web.Request) -> web.Response:
        path = os.path.join(WEB_DIR, "index.html")
        if os.path.exists(path):
            return web.FileResponse(path)
        return web.Response(text="panel page missing", status=404)

    async def metrics(self, request: web.Request) -> web.Response:
        """Engine observability (frames/sec, per-stage timings, map
        size) as JSON — the structured version of the reference's
        scattered Logger lines (SURVEY.md §5)."""
        data = self.metrics_fn() if self.metrics_fn else {}
        return web.json_response(data)

    async def panel_ws(self, request: web.Request) -> web.WebSocketResponse:
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        q = self.bus.subscribe(topics.CAMERA)

        async def push_frames():
            while True:
                ev: FrameEvent = await q.get()
                await ws.send_bytes(_encode_jpeg(ev.frame))

        pusher = asyncio.create_task(push_frames())
        try:
            async for msg in ws:
                if msg.type != WSMsgType.TEXT:
                    continue
                try:
                    payload = json.loads(msg.data)
                except json.JSONDecodeError:
                    await ws.send_str("ERROR")
                    continue
                frames_b64 = payload.get("calibrationFrames")
                if frames_b64:
                    reply = await self._run_calibration(frames_b64)
                    await ws.send_str(reply)
        finally:
            pusher.cancel()
            self.bus.unsubscribe(topics.CAMERA, q)
        return ws

    async def _run_calibration(self, frames_b64) -> str:
        """Decode browser-captured frames, calibrate, persist, broadcast
        (web_socket_handler.ex:25-52)."""
        import cv2

        from send_slam_tpu.calib.io import save_to_file
        from send_slam_tpu.calib.pipeline import calibrate

        frames = []
        for b64 in frames_b64:
            try:
                raw = base64.b64decode(b64.split(",")[-1])
                arr = np.frombuffer(raw, np.uint8)
                img = cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)
                if img is not None:
                    frames.append(img.astype(np.float32))
            except Exception:
                continue
        try:
            loop = asyncio.get_running_loop()
            result = await loop.run_in_executor(None, calibrate, frames)
        except Exception as e:
            log.warning("calibration failed: %s", e)
            return "ERROR"
        save_to_file(result)
        self.bus.publish(topics.CALIBRATION, result)
        return "OK"

    async def client_ws(self, request: web.Request) -> web.WebSocketResponse:
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        q = self.bus.subscribe(topics.POSE)

        async def push_poses():
            while True:
                pose = await q.get()
                await ws.send_str(json.dumps(pose_ws_json(pose)))

        pusher = asyncio.create_task(push_poses())
        try:
            async for _ in ws:
                pass                      # inbound ignored (:26-28)
        finally:
            pusher.cancel()
            self.bus.unsubscribe(topics.POSE, q)
        return ws
