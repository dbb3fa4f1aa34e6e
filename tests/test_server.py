"""Server-layer integration tests: bus semantics, TCP protocol
round-trip with a fake backend, web panel WS endpoints. The SLAM engine
is not exercised here (fake poses instead) — these tests pin the
*contract*, matching SURVEY.md §4's fake-backend seam."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from send_slam_tpu.io.ppm import decode_ppm
from send_slam_tpu.io.protocol import (
    PacketDecoder, build_pose_packet, frame_packet_bytes, TRACKING_OK,
)
from send_slam_tpu.server import bus as topics
from send_slam_tpu.server.bus import Bus
from send_slam_tpu.server.producers import FrameEvent
from send_slam_tpu.server.tcp import TcpFrameServer
from send_slam_tpu.server.web import WebPanel


def run(coro):
    return asyncio.run(asyncio.wait_for(coro, 30))


def make_event(w=32, h=24, cam=0, calib=None):
    rng = np.random.default_rng(0)
    return FrameEvent(
        frame=rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        timestamp=1.25, fps=30.0, camera_id=cam, calibration=calib)


class TestBus:
    def test_pubsub_fanout(self):
        async def go():
            bus = Bus()
            q1 = bus.subscribe("t")
            q2 = bus.subscribe("t")
            bus.publish("t", 42)
            assert await q1.get() == 42
            assert await q2.get() == 42
        run(go())

    def test_slow_consumer_drops_oldest(self):
        async def go():
            bus = Bus(maxsize=2)
            q = bus.subscribe("t")
            for i in range(5):
                bus.publish("t", i)
            got = [await q.get(), await q.get()]
            assert got == [3, 4]
        run(go())


class TestTcpServer:
    def test_frame_stream_and_pose_return(self):
        async def go():
            bus = Bus()
            srv = TcpFrameServer(bus, port=0)
            await srv.start()
            port = srv.bound_port

            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            await asyncio.sleep(0.1)

            calib = {
                "camera_matrix": np.array([[500.0, 0, 16], [0, 500, 12],
                                           [0, 0, 1]]),
                "distortion_coeffs": np.zeros((1, 5)),
            }
            poses_q = bus.subscribe(topics.POSE)
            bus.publish(topics.CAMERA, make_event(calib=calib))

            dec = PacketDecoder()
            pkts = []
            while len(pkts) < 2:
                data = await asyncio.wait_for(reader.read(65536), 5)
                assert data
                pkts.extend(dec.feed(data))

            # Calibration first (once per connection), then the frame.
            assert pkts[0]["type"] == "calibration"
            assert pkts[0]["camera"]["type"] == "PinHole"
            assert pkts[0]["camera"]["fx"] == 500.0
            assert pkts[1]["type"] == "frame"
            assert pkts[1]["encoding"] == "ppm"
            img = decode_ppm(pkts[1]["frame"])
            assert img.shape == (24, 32, 3)

            # Backend sends a pose; it must land on the POSE topic.
            pose = build_pose_packet(1.5, 0, TRACKING_OK, (1, 2, 3),
                                     (0, 0, 0, 1))
            writer.write(frame_packet_bytes(pose))
            await writer.drain()
            got = await asyncio.wait_for(poses_q.get(), 5)
            assert got["position"]["x"] == 1.0

            # New connections replay the cached calibration immediately
            # (calibration_cache.ex behaviour).
            r2, w2 = await asyncio.open_connection("127.0.0.1", port)
            dec2 = PacketDecoder()
            data = await asyncio.wait_for(r2.read(65536), 5)
            first = dec2.feed(data)[0]
            assert first["type"] == "calibration"

            writer.close()
            w2.close()
            await srv.stop()
        run(go())


class TestWebPanel:
    def _client(self, bus):
        panel = WebPanel(bus)
        return TestClient(TestServer(panel.app))

    def test_client_ws_pose_json(self):
        async def go():
            bus = Bus()
            client = self._client(bus)
            await client.start_server()
            ws = await client.ws_connect("/client")
            pose = build_pose_packet(2.0, 0, TRACKING_OK, (0.1, 0.2, 0.3),
                                     (0, 0, 0, 1))
            bus.publish(topics.POSE, pose)
            msg = await asyncio.wait_for(ws.receive_str(), 5)
            data = json.loads(msg)
            assert data["type"] == "pose"
            assert data["payload"]["position"]["y"] == 0.2
            assert data["payload"]["tracking_state"] == TRACKING_OK
            await ws.close()
            await client.close()
        run(go())

    def test_panel_ws_streams_jpeg(self):
        async def go():
            bus = Bus()
            client = self._client(bus)
            await client.start_server()
            ws = await client.ws_connect("/panel")
            await asyncio.sleep(0.1)
            bus.publish(topics.CAMERA, make_event())
            msg = await asyncio.wait_for(ws.receive_bytes(), 5)
            assert msg[:2] == b"\xff\xd8"      # JPEG SOI marker
            await ws.close()
            await client.close()
        run(go())

    def test_panel_calibration_error_reply(self):
        async def go():
            bus = Bus()
            client = self._client(bus)
            await client.start_server()
            ws = await client.ws_connect("/panel")
            # Garbage frames -> "ERROR" (web_socket_handler.ex:46-52).
            await ws.send_str(json.dumps({"calibrationFrames": ["!!!"]}))
            msg = await asyncio.wait_for(ws.receive_str(), 20)
            assert msg == "ERROR"
            await ws.close()
            await client.close()
        run(go())

    def test_index_served(self):
        async def go():
            bus = Bus()
            client = self._client(bus)
            await client.start_server()
            resp = await client.get("/")
            assert resp.status == 200
            text = await resp.text()
            assert "SEND-SLAM" in text
            await client.close()
        run(go())
