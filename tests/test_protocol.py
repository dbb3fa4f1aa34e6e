"""Wire-protocol golden-byte tests (the reference compatibility contract)."""

import struct

import msgpack
import numpy as np
import pytest

from send_slam_tpu.io import ppm
from send_slam_tpu.io.protocol import (
    MAX_PACKET_BYTES, PacketDecoder, build_calibration_packet,
    build_frame_packet, build_pose_packet, build_terminate_packet,
    frame_packet_bytes, pose_ws_json, TRACKING_OK,
)


class TestFraming:
    def test_length_prefix_big_endian(self):
        raw = frame_packet_bytes({"type": "terminate"})
        (length,) = struct.unpack(">I", raw[:4])
        assert length == len(raw) - 4
        assert msgpack.unpackb(raw[4:], raw=False) == {"type": "terminate"}

    def test_decoder_reassembles_split_packets(self):
        pkts = [build_terminate_packet(),
                build_pose_packet(1.5, 0, TRACKING_OK, (1, 2, 3), (0, 0, 0, 1))]
        stream = b"".join(frame_packet_bytes(p) for p in pkts)
        dec = PacketDecoder()
        got = []
        # Feed one byte at a time — worst-case fragmentation.
        for i in range(len(stream)):
            got.extend(dec.feed(stream[i:i + 1]))
        assert len(got) == 2
        assert got[0]["type"] == "terminate"
        assert got[1]["type"] == "pose"
        assert got[1]["position"] == {"x": 1.0, "y": 2.0, "z": 3.0}

    def test_decoder_multiple_packets_one_chunk(self):
        stream = frame_packet_bytes({"a": 1}) * 3
        got = PacketDecoder().feed(stream)
        assert got == [{"a": 1}] * 3

    def test_oversize_guard(self):
        dec = PacketDecoder()
        with pytest.raises(ValueError):
            dec.feed(struct.pack(">I", MAX_PACKET_BYTES + 1) + b"x")


class TestPacketSchemas:
    def test_frame_packet_fields(self):
        img = np.zeros((4, 6, 3), np.uint8)
        data = ppm.encode_ppm(img)
        p = build_frame_packet(0, 123.456, 6, 4, data)
        assert p["type"] == "frame"
        assert p["encoding"] == "ppm"
        assert set(p) == {"type", "camera_id", "encoding", "timestamp",
                          "width", "height", "channels", "frame"}
        # Binary survives msgpack roundtrip as bytes.
        rt = msgpack.unpackb(msgpack.packb(p, use_bin_type=True), raw=False)
        assert rt["frame"] == data

    def test_calibration_packet_matches_reference_schema(self):
        p = build_calibration_packet(0, 1.0, 640, 480, 517.3, 516.5, 318.6, 255.3)
        cam = p["camera"]
        # Field set from image_logger.ex:124-150.
        assert cam["type"] == "PinHole"
        assert cam["th_depth"] == 40.0
        assert cam["baseline"] == 0.0
        assert cam["depth_map_factor"] == 1000.0
        for key in ("width", "height", "fps", "rgb", "fx", "fy", "cx", "cy",
                    "k1", "k2", "p1", "p2", "k3"):
            assert key in cam, key

    def test_pose_ws_json_shape(self):
        pose = build_pose_packet(2.0, 1, TRACKING_OK, (0.1, 0.2, 0.3),
                                 (0.0, 0.0, 0.0, 1.0))
        msg = pose_ws_json(pose)
        assert msg["type"] == "pose"
        assert msg["payload"]["orientation"]["w"] == 1.0
        assert msg["payload"]["tracking_state"] == TRACKING_OK


class TestPPM:
    def test_roundtrip_rgb(self):
        img = np.random.default_rng(0).integers(0, 256, (33, 47, 3), dtype=np.uint8)
        assert np.array_equal(ppm.decode_ppm(ppm.encode_ppm(img)), img)

    def test_roundtrip_gray(self):
        img = np.random.default_rng(1).integers(0, 256, (20, 10), dtype=np.uint8)
        assert np.array_equal(ppm.decode_ppm(ppm.encode_ppm(img)), img)

    def test_decodes_cv2_encoded_ppm(self):
        import cv2
        img = np.random.default_rng(2).integers(0, 256, (16, 24, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".ppm", img[..., ::-1])  # cv2 takes BGR
        assert ok
        out = ppm.decode_ppm(buf.tobytes())
        assert np.array_equal(out, img)

    def test_gray_matches_cv2(self):
        img = np.random.default_rng(3).integers(0, 256, (32, 32, 3), dtype=np.uint8)
        import cv2
        ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        got = ppm.rgb_to_gray_u8(img)
        assert np.max(np.abs(got.astype(int) - ref.astype(int))) <= 1


class TestOrbslamYaml:
    def test_settings_yaml_roundtrip(self):
        """The field names the reference adapter writes
        (orbslam3_mono_networked.cc:158-223) must configure the engine."""
        from send_slam_tpu.config import from_orbslam_yaml
        text = "\n".join([
            "%YAML:1.0", "---",
            "Camera.type: \"PinHole\"",
            "Camera1.fx: 517.3", "Camera1.fy: 516.5",
            "Camera1.cx: 318.6", "Camera1.cy: 255.3",
            "Camera1.k1: 0.26", "Camera1.k2: -0.95",
            "Camera1.p1: -0.005", "Camera1.p2: 0.0026",
            "Camera.width: 640", "Camera.height: 480",
            "Camera.fps: 30", "Camera.RGB: 1",
            "ORBextractor.nFeatures: 1250",
            "ORBextractor.scaleFactor: 1.2",
            "ORBextractor.nLevels: 8",
            "ORBextractor.iniThFAST: 20",
            "ORBextractor.minThFAST: 7",
        ])
        cfg = from_orbslam_yaml(text)
        assert cfg.camera.fx == 517.3
        assert cfg.camera.k2 == -0.95
        assert cfg.camera.width == 640
        assert cfg.orb.n_features == 1250
        assert cfg.orb.ini_th_fast == 20
