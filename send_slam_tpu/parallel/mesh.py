"""Mesh construction helpers."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None,
              axis_names: Tuple[str, ...] = ("cam",)) -> Mesh:
    """1-D (or reshaped N-D) mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if len(axis_names) == 1:
        arr = np.asarray(devs)
    else:
        # Split devices as evenly as possible: first axis gets the
        # largest power-of-two factor.
        sizes = []
        rem = n_devices
        for i, _ in enumerate(axis_names[:-1]):
            f = 1
            while rem % 2 == 0 and f * 2 * (2 ** (len(axis_names) - i - 1)) <= rem:
                f *= 2
                rem //= 2
            sizes.append(f)
        sizes.append(rem)
        arr = np.asarray(devs).reshape(sizes)
    return Mesh(arr, axis_names)
