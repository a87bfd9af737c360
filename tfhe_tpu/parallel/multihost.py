"""Multi-host runtime: process-group init and global meshes over DCN.

The reference has no distribution of any kind (SURVEY.md section 5). This is
the framework's multi-host entry point: each host starts one process,
`initialize()` wires them into one JAX runtime (coordinator + process id,
standard `jax.distributed` semantics — ICI collectives within a slice, DCN
across hosts), and `global_mesh` lays a ('data', 'model') mesh over ALL
processes' devices. Every sharded routine in parallel/mesh.py then works
unchanged: shard_map + psum/all_gather are backend-agnostic over the global
mesh.

Tested cross-process on localhost CPU (tests/test_multihost.py spawns two
single-device processes and asserts the distributed batched NAND is
bit-identical to the single-process result); the same code path drives
multi-host TPU pods (set TFHE_COORD/TFHE_NPROC/TFHE_PID or rely on the TPU
environment's automatic detection).
"""

from __future__ import annotations


import jax
import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the process group. Arguments default to TFHE_COORD / TFHE_NPROC /
    TFHE_PID env vars; on TPU pods with auto-detection, call with no args."""
    from ..tuning import env_int, env_str

    coordinator = coordinator or env_str("TFHE_COORD")
    if num_processes is None:
        num_processes = env_int("TFHE_NPROC")
    if process_id is None:
        process_id = env_int("TFHE_PID")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(data: int, model: int = 1):
    """('data', 'model') mesh over ALL processes' devices (global order)."""
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def host_local_batch_to_global(x, mesh, spec):
    """Assemble per-process local batch shards into one global array.

    x: the process-local shard (equal-sized across processes, concatenated
    in process order along the sharded axis).
    """
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(x, mesh, spec)


def global_to_host_local(x, mesh, spec):
    from jax.experimental import multihost_utils

    return multihost_utils.global_array_to_host_local_array(x, mesh, spec)
