"""Multi-host utilities: distributed init, host barriers, batch slicing.

The reference's multi-process story is torch.distributed + NCCL inside
torchrec (reference: Dockerfile:16-18, config/config.yaml:24
NCCL_DEBUG); the TPU-native story is ``jax.distributed.initialize`` once
per process and a ``('dcn', 'ici')`` mesh over all devices — collectives
are then compiler-inserted (SURVEY.md §5.8).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax

log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize JAX's distributed runtime when running multi-host.

    No-ops for single-process runs (the common dev case).  Arguments
    default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or cloud auto-detection.
    Returns (process_index, process_count).
    """
    coordinator = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    n = num_processes or _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator and n and n > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=n,
            process_id=pid or 0)
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
    return jax.process_index(), jax.process_count()


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def is_primary() -> bool:
    return jax.process_index() == 0


def sync_hosts(tag: str = "barrier") -> None:
    """Cross-host barrier: a tiny psum over all devices."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this process's slice of the global batch —
    each host feeds only its addressable devices."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} must divide process count {n}")
    size = global_batch_size // n
    return jax.process_index() * size, size


def mesh_shape_for_hosts(devices_per_host: Optional[int] = None
                         ) -> Tuple[int, int]:
    """(dcn, ici) = (hosts, chips-per-host) for the standard deployment
    layout: data-parallel across hosts over DCN, embedding shards across
    chips over ICI."""
    hosts = jax.process_count()
    per_host = devices_per_host or (jax.device_count() // hosts)
    return hosts, per_host
