"""Backend process supervision (DockerHandler parity)."""

import asyncio
import os

import pytest

from send_slam_tpu.server.process_manager import (
    ProcessManager, env_passthrough,
)


def run(coro):
    return asyncio.run(asyncio.wait_for(coro, 30))


class TestEnvPassthrough:
    def test_prefix_stripped(self, monkeypatch):
        monkeypatch.setenv("ORBSLAM3_MAP_PATH", "/data/maps")
        monkeypatch.setenv("ORBSLAM3_FOO", "bar")
        env = env_passthrough({"BASE": "1"})
        assert env["MAP_PATH"] == "/data/maps"
        assert env["FOO"] == "bar"
        assert env["BASE"] == "1"


class TestProcessManager:
    def test_start_status_logs_stop(self):
        async def go():
            pm = ProcessManager(
                "sh -c 'echo hello; sleep 30'",
                poll_interval=0.2)
            await pm.start()
            await asyncio.sleep(0.5)
            assert pm.status() == "running"
            assert any("hello" in l for l in pm.logs())
            await pm.stop()
            assert pm.status().startswith("exited")
        run(go())

    def test_auto_restart_on_death(self):
        async def go():
            pm = ProcessManager(
                "sh -c 'echo up'",   # exits immediately
                poll_interval=0.1)
            await pm.start()
            p1 = pm._proc.pid
            # Wait for the poll loop to notice + respawn.
            for _ in range(50):
                await asyncio.sleep(0.2)
                if pm._proc.pid != p1:
                    break
            assert pm._proc.pid != p1, "backend was not respawned"
            await pm.stop()
        run(go())
