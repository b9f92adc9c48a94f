"""Multi-host initialization.

Replaces the reference's ``fl::initDistributed(worldRank, worldSize,
maxDevPerNode, rndvFilepath)`` + NCCL rendezvous (``cpc/Train.cpp:342-353``):
on TPU pods, ``jax.distributed.initialize`` talks to the coordinator and
every collective rides ICI/DCN via XLA — no rendezvous files, no reducers.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX if requested via args or env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). Safe to
    call when single-host (no-op). Returns topology info."""
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
