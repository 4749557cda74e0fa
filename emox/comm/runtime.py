"""Multi-host process bootstrap.

Replaces the reference's NCCL TCP-rendezvous init (reference
magicanimate/utils/dist_tools.py:18-59: init_process_group('nccl',
tcp://...), warmup all_reduce, rank helpers) with jax.distributed: on TPU
pods the coordinator is discovered from the environment; collectives ride
ICI/DCN via GSPMD with no explicit communicator objects.
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Optional

import jax

log = logging.getLogger(__name__)
_initialized = False


class ProcessInfo(NamedTuple):
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> ProcessInfo:
    """Idempotent multi-process init (single-process is a no-op, like the
    reference's degrade-to-rank-0 behaviour, dist_tools.py:62-69)."""
    global _initialized
    if not _initialized and (coordinator_address is not None or num_processes not in (None, 1)):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            _initialized = True
        except (RuntimeError, ValueError) as e:  # already initialized / single proc
            log.warning("jax.distributed.initialize skipped: %s", e)
    return process_info()


def process_info() -> ProcessInfo:
    return ProcessInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )


def is_master() -> bool:
    """Rank-0 check (reference dist_tools.py:71-73)."""
    return jax.process_index() == 0
