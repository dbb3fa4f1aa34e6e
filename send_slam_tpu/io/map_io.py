"""Map checkpoint / resume.

The reference plumbs ORBSLAM3_MAP_PATH into the backend container
(application.ex:91-93) and links boost_serialization for ORB-SLAM3's
Atlas save/load (CMakeLists.txt:115-116) — but the adapter never
invokes it (SURVEY.md §5). Here map persistence is real: MapState is a
pytree of arrays, so a checkpoint is one compressed npz (+ a small
JSON header for versioning), and multi-session mapping loads it back
and relocalizes against it.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from send_slam_tpu.models.map_state import MapState

FORMAT_VERSION = 2
ENV_VAR = "ORBSLAM3_MAP_PATH"  # reference env name, honored for parity


def default_map_path(root: Optional[str] = None) -> str:
    env = os.environ.get(ENV_VAR)
    if env:
        base = os.path.expanduser(env)
    else:
        base = os.path.join(root or os.getcwd(), "priv", "maps")
    return os.path.join(base, "map.npz")


def save_map(m: MapState, path: Optional[str] = None) -> str:
    path = path or default_map_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = {f: np.asarray(getattr(m, f)) for f in m._fields}
    header = json.dumps({
        "version": FORMAT_VERSION,
        "max_keyframes": int(m.max_keyframes),
        "max_landmarks": int(m.max_landmarks),
        "n_keypoints": int(m.n_keypoints),
    })
    np.savez_compressed(path, __header__=np.frombuffer(
        header.encode(), dtype=np.uint8), **arrays)
    return path


def load_map(path: Optional[str] = None) -> MapState:
    import dataclasses

    import jax.numpy as jnp

    from send_slam_tpu.config import MapConfig
    from send_slam_tpu.models.map_state import empty_map

    path = path or default_map_path()
    with np.load(path) as data:
        header = json.loads(bytes(data["__header__"]).decode())
        if header["version"] > FORMAT_VERSION:
            raise ValueError(f"unsupported map version {header['version']}")
        # Fields added after the file's version get their empty-map
        # defaults at the HEADER capacities — any older checkpoint loads
        # into the current MapState schema without per-field special
        # cases.
        cfg = dataclasses.replace(
            MapConfig(),
            max_keyframes=int(header["max_keyframes"]),
            max_landmarks=int(header["max_landmarks"]),
        )
        base = empty_map(cfg, int(header["n_keypoints"]))
        fields = {f: jnp.asarray(data[f])
                  for f in MapState._fields if f in data.files}
        return base._replace(**fields)
