"""Scale-out layer: device meshes, sharded keys, SPMD batched bootstrapping."""

from .mesh import (
    make_mesh,
    shard_cloud_key,
    shard_batch,
    make_bootstrap_sharded,
    make_gate_nand_sharded,
    make_pbs_sharded,
)

__all__ = [
    "make_mesh",
    "shard_cloud_key",
    "shard_batch",
    "make_bootstrap_sharded",
    "make_gate_nand_sharded",
    "make_pbs_sharded",
]

from .mesh import shard_mk_cloud_key, shard_mk_batch  # noqa: E402

__all__ += ["shard_mk_cloud_key", "shard_mk_batch"]

from .mesh import (  # noqa: E402
    shard_bootstrap_key_model,
    make_blind_rotate_model_sharded,
)

__all__ += ["shard_bootstrap_key_model", "make_blind_rotate_model_sharded"]
