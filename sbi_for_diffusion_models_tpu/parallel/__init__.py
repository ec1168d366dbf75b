"""Mesh scale-out: sharded simulation, data-parallel training, chain sharding."""

from .mesh import (
    default_mesh,
    make_dp_train_step,
    pad_to_multiple,
    replicate,
    shard_leading,
    sharded_run_nuts,
    sharded_simulate,
)
from .multihost import global_mesh, initialize_multihost, is_multihost, process_info

__all__ = [
    "default_mesh",
    "global_mesh",
    "initialize_multihost",
    "is_multihost",
    "make_dp_train_step",
    "pad_to_multiple",
    "process_info",
    "replicate",
    "shard_leading",
    "sharded_run_nuts",
    "sharded_simulate",
]
