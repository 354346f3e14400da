"""Device mesh helpers.

The reference's multi-GPU model is one OS thread + CUDA context per device
pulling work from a mutex-guarded counter (1_9_7File.pb:2077-2092,
:4772-4815). The TPU-native equivalent is a jax.sharding.Mesh with
deterministic epoch striping — no mutexes, no host threads, collectives
over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


CHIPS_AXIS = "chips"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first n_devices (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CHIPS_AXIS,))
