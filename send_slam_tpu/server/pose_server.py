"""Stand-alone pose-only WebSocket server.

Parity with SendSlam.PoseWebServer (pose_web_server.ex:11-14, port
4001, ``GET /ws`` — present but disabled in the reference,
application.ex:111-115): a minimal endpoint for consumers that only
want the pose stream without the panel."""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Optional

from aiohttp import web

from send_slam_tpu.io.protocol import pose_ws_json
from send_slam_tpu.server import bus as topics
from send_slam_tpu.server.bus import Bus

log = logging.getLogger(__name__)


class PoseServer:
    def __init__(self, bus: Bus, host: str = "0.0.0.0", port: int = 4001):
        self.bus = bus
        self.host = host
        self.port = port
        self.app = web.Application()
        self.app.router.add_get("/ws", self.ws)
        self._runner: Optional[web.AppRunner] = None

    async def start(self) -> None:
        self._runner = web.AppRunner(self.app)
        await self._runner.setup()
        await web.TCPSite(self._runner, self.host, self.port).start()
        log.info("pose server on ws://%s:%d/ws", self.host, self.port)

    async def stop(self) -> None:
        if self._runner:
            await self._runner.cleanup()

    async def ws(self, request: web.Request) -> web.WebSocketResponse:
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        q = self.bus.subscribe(topics.POSE)

        async def push():
            while True:
                pose = await q.get()
                await ws.send_str(json.dumps(pose_ws_json(pose)))

        task = asyncio.create_task(push())
        try:
            async for _ in ws:
                pass
        finally:
            task.cancel()
            self.bus.unsubscribe(topics.POSE, q)
        return ws
