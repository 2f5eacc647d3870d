"""Multi-host bootstrap + pod-level mesh helpers.

The reference has no distributed execution at all (SURVEY §2.4). This
module wires `jax.distributed.initialize` (the standard multi-controller
bootstrap) and builds pod-level meshes where the tensor-parallel axis stays
inside a slice (ICI) and the data-parallel axis spans hosts (DCN), so TP
collectives never cross the slower network.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime. No-ops on a single process.

    With no arguments, jax.distributed auto-detects TPU pod environments
    (GCE metadata / megascale env vars). Explicit args cover manual
    bring-up (e.g. COORDINATOR_ADDRESS=host:port)."""
    if num_processes is None:
        env_n = os.environ.get("NUM_PROCESSES") or os.environ.get("SLURM_NTASKS")
        num_processes = int(env_n) if env_n else None
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(tp: Optional[int] = None) -> Mesh:
    """('dp', 'tp') mesh over all global devices: tp within a host/slice
    (ICI), dp across hosts (DCN). Defaults tp = local device count."""
    devices = jax.devices()
    local = jax.local_device_count()
    tp = tp or local
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    dp = len(devices) // tp
    # jax.devices() orders by process, so reshaping keeps each tp group
    # within one process's (ICI-connected) devices when tp <= local count
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def is_primary() -> bool:
    return jax.process_index() == 0
