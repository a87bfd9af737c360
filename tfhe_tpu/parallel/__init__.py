"""Scale-out layer: device meshes, sharded keys, SPMD batched bootstrapping."""

from .mesh import (
    make_mesh,
    shard_cloud_key,
    shard_batch,
    make_bootstrap_sharded,
    make_gate_nand_sharded,
)

__all__ = [
    "make_mesh",
    "shard_cloud_key",
    "shard_batch",
    "make_bootstrap_sharded",
    "make_gate_nand_sharded",
]

from .mesh import shard_mk_cloud_key, shard_mk_batch  # noqa: E402

__all__ += ["shard_mk_cloud_key", "shard_mk_batch"]
