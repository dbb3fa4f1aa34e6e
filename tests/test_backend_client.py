"""Backend-role protocol test: the TPU engine as a drop-in replacement
for the reference's dockerized backend — it must consume
calibration/frame/terminate packets from a host and emit pose packets.
Uses a tiny engine config and a synthetic-world sequence so tracking
actually initializes and poses flow back."""

import asyncio

import numpy as np

from send_slam_tpu.config import (
    CameraConfig, EngineConfig, MapConfig, OrbConfig, TrackingConfig,
)
from send_slam_tpu.io.ppm import encode_ppm
from send_slam_tpu.io.protocol import (
    PacketDecoder, build_calibration_packet, build_frame_packet,
    build_terminate_packet, frame_packet_bytes,
)
from send_slam_tpu.server.backend_client import BackendClient
from send_slam_tpu.utils.synth import SyntheticWorld


def test_backend_client_roundtrip():
    world = SyntheticWorld(n_points=600)

    def cfg_factory(pkt):
        cam = pkt["camera"]
        return EngineConfig(
            orb=OrbConfig(n_features=512, n_levels=4),
            camera=CameraConfig(
                width=int(cam["width"]), height=int(cam["height"]),
                fx=float(cam["fx"]), fy=float(cam["fy"]),
                cx=float(cam["cx"]), cy=float(cam["cy"])),
            map=MapConfig(max_keyframes=16, max_landmarks=1024, ba_window=4),
            # Protocol-path tests, not accuracy tests: the young-map
            # collapse probe HOLDS poses while pending and a failed
            # probe resets the map — on a ~20-frame clip either outcome
            # can leave zero pose packets depending on the basin.
            # Disable it so packet flow is deterministic.
            tracking=TrackingConfig(init_min_matches=50,
                                    init_collapse_frac=0.0),
        )

    received_poses = []

    async def host(reader, writer):
        # Send calibration then a short sequence of frames.
        writer.write(frame_packet_bytes(build_calibration_packet(
            0, 0.0, world.W, world.H, world.fx, world.fy,
            world.cx, world.cy)))
        ts, Rs, tls = world.trajectory(n_frames=20)
        for k in range(len(ts)):
            img = world.render(Rs[k], tls[k]).astype(np.uint8)
            rgb = np.repeat(img[..., None], 3, axis=2)
            writer.write(frame_packet_bytes(build_frame_packet(
                0, float(ts[k]), world.W, world.H, encode_ppm(rgb))))
        await writer.drain()

        # Collect poses until the client has chewed the frames.
        dec = PacketDecoder()
        try:
            while True:
                data = await asyncio.wait_for(reader.read(65536), 300)
                if not data:
                    break
                for pkt in dec.feed(data):
                    if pkt.get("type") == "pose":
                        received_poses.append(pkt)
                if received_poses:
                    # At least one pose proves the path; terminate.
                    writer.write(frame_packet_bytes(build_terminate_packet()))
                    await writer.drain()
                    return
        except asyncio.TimeoutError:
            pass
        finally:
            # Always close: a silent host must not leave the client
            # blocked on read() forever.
            writer.close()

    async def go():
        server = await asyncio.start_server(host, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        client = BackendClient("127.0.0.1", port, config_factory=cfg_factory)
        client.trajectory_path = None  # dump covered by the scale test
        await asyncio.wait_for(client.run(), 900)
        server.close()
        await server.wait_closed()
        assert client.frames_seen >= 3
        assert received_poses, "no pose packets came back"
        p = received_poses[0]
        assert set(p["position"]) == {"x", "y", "z"}
        assert set(p["orientation"]) == {"x", "y", "z", "w"}
        assert p["tracking_state"] == 2

    asyncio.run(go())


def test_backend_client_image_scale_and_shutdown_report(tmp_path, capsys):
    """Parity tail of the reference adapter: the imageScale resize path
    (orbslam3_mono_networked.cc:512,556-580 — frames arrive at full
    resolution and the engine runs on the scaled geometry) and the
    terminate behaviors (…cc:653-671): sorted median/mean tracking-time
    stats on stdout + SaveKeyFrameTrajectoryTUM."""
    # Render at 2x so the engine — after the 0.5 imageScale resize —
    # runs at the well-tested 320x240 geometry.
    world = SyntheticWorld(n_points=600, width=640, height=480, fx=520.0)
    scale = 0.5

    def cfg_factory(pkt):
        cam = pkt["camera"]
        s = float(cam.get("image_scale", 1.0))
        return EngineConfig(
            orb=OrbConfig(n_features=512, n_levels=4),
            camera=CameraConfig(
                width=int(cam["width"] * s), height=int(cam["height"] * s),
                fx=float(cam["fx"]) * s, fy=float(cam["fy"]) * s,
                cx=float(cam["cx"]) * s, cy=float(cam["cy"]) * s),
            map=MapConfig(max_keyframes=16, max_landmarks=1024, ba_window=4),
            # Protocol-path tests, not accuracy tests: the young-map
            # collapse probe HOLDS poses while pending and a failed
            # probe resets the map — on a ~20-frame clip either outcome
            # can leave zero pose packets depending on the basin.
            # Disable it so packet flow is deterministic.
            tracking=TrackingConfig(init_min_matches=50,
                                    init_collapse_frac=0.0),
        )

    received_poses = []

    async def host(reader, writer):
        calib = build_calibration_packet(
            0, 0.0, world.W, world.H, world.fx, world.fy,
            world.cx, world.cy)
        calib["camera"]["image_scale"] = scale
        writer.write(frame_packet_bytes(calib))
        ts, Rs, tls = world.trajectory(n_frames=20)
        for k in range(len(ts)):
            img = world.render(Rs[k], tls[k]).astype(np.uint8)
            rgb = np.repeat(img[..., None], 3, axis=2)
            writer.write(frame_packet_bytes(build_frame_packet(
                0, float(ts[k]), world.W, world.H, encode_ppm(rgb))))
        await writer.drain()
        dec = PacketDecoder()
        try:
            while True:
                data = await asyncio.wait_for(reader.read(65536), 300)
                if not data:
                    break
                for pkt in dec.feed(data):
                    if pkt.get("type") == "pose":
                        received_poses.append(pkt)
                if received_poses:
                    writer.write(frame_packet_bytes(build_terminate_packet()))
                    await writer.drain()
                    return
        except asyncio.TimeoutError:
            pass
        finally:
            writer.close()

    traj_path = tmp_path / "KeyFrameTrajectory.txt"

    async def go():
        server = await asyncio.start_server(host, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        client = BackendClient("127.0.0.1", port, config_factory=cfg_factory)
        client.trajectory_path = str(traj_path)
        await asyncio.wait_for(client.run(), 900)
        server.close()
        await server.wait_closed()
        # The engine ran on the SCALED geometry.
        assert client.image_scale == scale
        assert client.system.cfg.camera.width == world.W * scale
        assert received_poses, "no pose packets at scaled resolution"
        assert len(client.track_times) == client.frames_seen

    asyncio.run(go())

    # Shutdown stats print (reference prints sorted median + mean).
    out = capsys.readouterr().out
    assert "-------" in out
    assert "Frames processed:" in out
    assert "median tracking time:" in out
    assert "mean tracking time:" in out

    # TUM keyframe trajectory dump: one 8-column line per keyframe.
    lines = traj_path.read_text().strip().splitlines()
    assert len(lines) >= 2
    for ln in lines:
        cols = ln.split()
        assert len(cols) == 8
        [float(c) for c in cols]
