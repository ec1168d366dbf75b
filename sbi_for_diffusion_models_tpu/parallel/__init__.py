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

__all__ = [
    "default_mesh",
    "make_dp_train_step",
    "pad_to_multiple",
    "replicate",
    "shard_leading",
    "sharded_run_nuts",
    "sharded_simulate",
]
