"""Distributed runtime: process init, mesh axes, GSPMD sharding rules.

TPU-native replacement for the reference's NCCL layer (reference
magicanimate/utils/dist_tools.py): no process groups, no hand-rolled
collectives — one mesh, sharding annotations, XLA inserts the collectives
over ICI/DCN.
"""

from emox.comm.runtime import initialize_distributed, process_info, is_master
from emox.comm.sharding import (
    batch_spec,
    param_shardings,
    shard_batch,
    with_context_sharding,
)

__all__ = [
    "initialize_distributed",
    "process_info",
    "is_master",
    "batch_spec",
    "param_shardings",
    "shard_batch",
    "with_context_sharding",
]
