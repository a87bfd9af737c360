"""Restartable encrypted batch job: ripple-adder netlist with checkpoints.

Demonstrates the checkpoint-restart elasticity model (utils/jobs.py): run
it, kill it at any point (or use --preempt-after N to self-kill after N
checkpoints), run it again with the same arguments — it resumes at the last
checkpoint and the final sums still decrypt correctly.

Usage: python tools/batch_job.py [--bits 8] [--batch 64] [--every 2]
                                 [--ckpt /tmp/tfhe_job.ckpt]
                                 [--preempt-after N] [--params toy|80]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import tfhe_tpu as tt
from tfhe_tpu import circuits, netlist
from tfhe_tpu.lwe import LweSample
from tfhe_tpu.utils import jobs
from tfhe_tpu.utils.sync import prime_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--every", type=int, default=2)
    ap.add_argument("--ckpt", default="/tmp/tfhe_job.ckpt")
    ap.add_argument("--preempt-after", type=int, default=0)
    ap.add_argument("--params", default="toy", choices=["toy", "80"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars alone are too "
                         "late once sitecustomize imports jax)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    prime_sync()

    params = (tt.tfhe_parameters_toy() if args.params == "toy"
              else tt.tfhe_parameters_80())
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)

    circ = netlist.Circuit()
    a_w = circ.inputs(args.bits)
    b_w = circ.inputs(args.bits)
    # ripple-carry sum (same structure as tests/test_netlist.py)
    carry, sum_w = None, []
    for i in range(args.bits):
        axb = circ.xor(a_w[i], b_w[i])
        if carry is None:
            sum_w.append(axb)
            carry = circ.and_(a_w[i], b_w[i])
        else:
            sum_w.append(circ.xor(axb, carry))
            if i + 1 < args.bits:
                carry = circ.mux(axb, carry, a_w[i])
    sched = circ.compile(outputs=sum_w)

    rng = np.random.default_rng(7)
    mod = np.uint32(1) << args.bits
    a_vals = rng.integers(0, mod, args.batch).astype(np.uint32)
    b_vals = rng.integers(0, mod, args.batch).astype(np.uint32)
    ct_a = circuits.encrypt_word(jax.random.PRNGKey(1), sk, a_vals, args.bits)
    ct_b = circuits.encrypt_word(jax.random.PRNGKey(2), sk, b_vals, args.bits)
    inputs = {}
    for i in range(args.bits):
        inputs[a_w[i]] = LweSample(ct_a.a[:, i], ct_a.b[:, i], ct_a.cv[:, i])
        inputs[b_w[i]] = LweSample(ct_b.a[:, i], ct_b.b[:, i], ct_b.cv[:, i])

    t0 = time.time()

    def report(done, total):
        print(f"checkpoint: {done}/{total} batches "
              f"({time.time() - t0:.1f}s)", flush=True)
        if args.preempt_after and done >= args.preempt_after:
            print("simulated preemption: exiting (rerun to resume)")
            os._exit(17)

    state = jobs.run_checkpointed(
        sched, ck, inputs, args.ckpt, batch_shape=(args.batch,),
        every=args.every, on_chunk=report)

    bits = np.stack(
        [np.asarray(tt.decrypt(sk, sched.wire(state, w))) for w in sum_w],
        axis=-1)
    got = sum(bits[:, i].astype(np.uint32) << np.uint32(i)
              for i in range(args.bits))
    ok = int((got == (a_vals + b_vals) % mod).sum())
    print(f"done in {time.time() - t0:.1f}s: {ok}/{args.batch} sums correct")


if __name__ == "__main__":
    main()
