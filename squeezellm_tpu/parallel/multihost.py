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

    With no arguments, the bring-up only runs when a multi-process
    environment is detectable (NUM_PROCESSES / SLURM_NTASKS > 1, or a TPU
    pod's megascale coordinator env) — jax.distributed auto-detects the
    rest there. A plain single process is a strict no-op: calling
    jax.distributed.initialize after any backend use raises, so eagerly
    attempting auto-detect on one process would poison normal runs.
    Explicit args always initialize (manual bring-up, host:port)."""
    if num_processes is None:
        env_n = os.environ.get("NUM_PROCESSES") or os.environ.get("SLURM_NTASKS")
        num_processes = int(env_n) if env_n else None
    if num_processes is not None and num_processes <= 1:
        return
    pod_env = any(
        os.environ.get(k)
        for k in ("MEGASCALE_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    # multi-worker only when the hostname list has >1 entry (single-host
    # runtimes, e.g. the axon tunnel, export TPU_WORKER_HOSTNAMES=localhost)
    pod_env = pod_env or ("," in os.environ.get("TPU_WORKER_HOSTNAMES", ""))
    if (num_processes is None and coordinator_address is None
            and not pod_env):
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
