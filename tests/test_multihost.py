"""Cross-process collectives: 2 localhost CPU processes, bit-identical NAND.

Spawns two single-device subprocesses that join one JAX process group
(jax.distributed over localhost), build a global ('data'=2, 'model'=1) mesh,
run the SPMD batched NAND with each process holding half the batch, and
compare against the single-process result computed independently in each
process (identical PRNG seeds make keys/ciphertexts deterministic). This is
the multi-host DCN code path the virtual single-process mesh cannot
exercise.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly one local CPU device
import jax
jax.config.update("jax_platforms", "cpu")

# join the process group BEFORE anything can initialize the XLA backend
jax.distributed.initialize(
    coordinator_address=os.environ["TFHE_COORD"],
    num_processes=int(os.environ["TFHE_NPROC"]),
    process_id=int(os.environ["TFHE_PID"]),
)
from tfhe_tpu.parallel import multihost  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import tfhe_tpu as tt
from tfhe_tpu import parallel
from tfhe_tpu.lwe import LweSample

params = tt.tfhe_parameters_toy()
sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)

B = 8
bits_x = jnp.arange(B) % 2 == 0
bits_y = jnp.arange(B) % 3 == 0
ct_x = tt.encrypt(jax.random.PRNGKey(1), sk, bits_x)
ct_y = tt.encrypt(jax.random.PRNGKey(2), sk, bits_y)

# single-process reference (local device only)
from tfhe_tpu import gates
want = gates.gate_nand(ck, ct_x, ct_y)

mesh = multihost.global_mesh(data=2, model=1)
pid = jax.process_index()
half = B // 2


def to_global(ct):
    lo, hi = pid * half, (pid + 1) * half
    return LweSample(
        multihost.host_local_batch_to_global(
            np.asarray(ct.a[lo:hi]), mesh, P(("data", "model"), None)),
        multihost.host_local_batch_to_global(
            np.asarray(ct.b[lo:hi]), mesh, P(("data", "model"))),
        multihost.host_local_batch_to_global(
            np.asarray(ct.cv[lo:hi]), mesh, P(("data", "model"))),
    )


gx, gy = to_global(ct_x), to_global(ct_y)
ck_sharded = parallel.shard_cloud_key(ck, mesh)
nand = parallel.make_gate_nand_sharded(mesh, params)
out = nand(ck_sharded, gx, gy)

local = multihost.global_to_host_local(out.a, mesh, P("data", None))
want_local = np.asarray(want.a[pid * half:(pid + 1) * half])
np.testing.assert_array_equal(np.asarray(local), want_local)
local_b = multihost.global_to_host_local(out.b, mesh, P("data"))
np.testing.assert_array_equal(
    np.asarray(local_b), np.asarray(want.b[pid * half:(pid + 1) * half]))
print(f"proc {pid}: multihost NAND bit-identical", flush=True)
"""


@pytest.mark.slow
def test_two_process_nand_bit_identical(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = 12765
    env_base = {
        **os.environ,
        "TFHE_COORD": f"localhost:{port}",
        "TFHE_NPROC": "2",
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "TFHE_PID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "bit-identical" in out
