"""Device mesh helpers (single-host and multi-host).

The reference's multi-GPU model is one OS thread + CUDA context per device
pulling work from a mutex-guarded counter (1_9_7File.pb:2077-2092,
:4772-4815), and it has NO multi-node capability at all (the CUDA driver
import is its entire backend, :55-106). The TPU-native equivalent is a
jax.sharding.Mesh with deterministic epoch striping — no mutexes, no host
threads, collectives over ICI — and multi-host scale-out comes free from
jax.distributed + a process-spanning mesh (BASELINE.json config 5:
v5e-16 across hosts).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


CHIPS_AXIS = "chips"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime (idempotent).

    With no arguments, auto-detects the cluster environment (TPU pods set
    the coordination variables); explicit arguments support manual
    launches (e.g. the 2-process CPU-mesh test). After this returns,
    jax.devices() spans every process and make_mesh() builds a global
    mesh. No-op when the process group is size 1 and nothing is
    configured.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if (coordinator_address is None and num_processes is None
            and "JAX_COORDINATOR_ADDRESS" not in os.environ
            and "COORDINATOR_ADDRESS" not in os.environ):
        return  # single-process run, nothing to do
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(n_devices: int | None = None, devices=None,
              device_ids=None) -> Mesh:
    """1-D mesh over the first n_devices (default: all devices, which
    spans every process after init_distributed). ``device_ids`` selects
    specific chips by index — the reference's ``-d 1,2,3`` GPU selection
    (1_9_7File.pb:4772-4815)."""
    if devices is None:
        devices = jax.devices()
    if device_ids is not None:
        devices = [devices[i] for i in device_ids]
    elif n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CHIPS_AXIS,))
