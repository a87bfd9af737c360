"""Restartable batch jobs: checkpointed execution resumes bitwise-exactly.

Covers the SURVEY.md section 5 failure/elasticity plan: batch jobs are
restartable at scheduled-batch granularity, keys being static inputs.
"""

import jax
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import netlist
from tfhe_tpu.lwe import LweSample
from tfhe_tpu.utils import jobs

from test_netlist import build_adder


@pytest.fixture(scope="module")
def adder_job():
    params = tt.tfhe_parameters_toy()
    sk, ck = tt.make_key_pair(jax.random.PRNGKey(123), params)

    circ = netlist.Circuit()
    a_w = circ.inputs(4)
    b_w = circ.inputs(4)
    sum_w = build_adder(circ, a_w, b_w)
    sched = circ.compile()

    from tfhe_tpu import circuits

    a_vals = np.asarray([5, 11], np.uint32)
    b_vals = np.asarray([9, 6], np.uint32)
    ct_a = circuits.encrypt_word(jax.random.PRNGKey(1), sk, a_vals, 4)
    ct_b = circuits.encrypt_word(jax.random.PRNGKey(2), sk, b_vals, 4)
    inputs = {}
    for i in range(4):
        inputs[a_w[i]] = LweSample(ct_a.a[:, i], ct_a.b[:, i], ct_a.cv[:, i])
        inputs[b_w[i]] = LweSample(ct_b.a[:, i], ct_b.b[:, i], ct_b.cv[:, i])
    return sk, ck, sched, inputs, sum_w, (a_vals + b_vals) % 16


def _assert_states_equal(got, want):
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))


def test_resume_after_preemption_bitwise_exact(adder_job, tmp_path):
    sk, ck, sched, inputs, sum_w, want_sums = adder_job
    want = sched.run(ck, inputs, batch_shape=(2,))
    ckpt = str(tmp_path / "job.ckpt")

    class Preempt(Exception):
        pass

    def kill_after_two(done, total):
        if done >= 2:
            raise Preempt

    with pytest.raises(Preempt):
        jobs.run_checkpointed(sched, ck, inputs, ckpt, batch_shape=(2,),
                              every=1, on_chunk=kill_after_two)
    assert sched.n_batches > 2  # the job really was cut short

    # restarted process: must resume (not redo) and finish bitwise-identical
    chunks = []
    state = jobs.run_checkpointed(
        sched, ck, inputs, ckpt, batch_shape=(2,), every=1,
        on_chunk=lambda done, total: chunks.append(done))
    assert chunks[0] == 3  # resumed at batch 2, first chunk completes 3
    _assert_states_equal(state, want)
    assert not (tmp_path / "job.ckpt").exists()  # cleaned up on completion

    # decrypt-level sanity on top of the bitwise check
    bits = np.stack(
        [np.asarray(tt.decrypt(sk, sched.wire(state, w))) for w in sum_w],
        axis=-1)
    got = sum(bits[:, i].astype(np.uint32) << i for i in range(4))
    np.testing.assert_array_equal(got, want_sums)


def test_stale_checkpoint_ignored(adder_job, tmp_path):
    _, ck, sched, inputs, _, _ = adder_job
    want = sched.run(ck, inputs, batch_shape=(2,))
    ckpt = str(tmp_path / "job.ckpt")

    # a checkpoint from a DIFFERENT job (other batch shape -> fingerprint
    # mismatch) must be ignored, not resumed into shape errors
    other_fp = jobs.job_fingerprint(sched, ck.params, (7,))
    jobs._save_atomic((other_fp, 1, want), ckpt)
    state = jobs.run_checkpointed(sched, ck, inputs, ckpt, batch_shape=(2,),
                                  every=4)
    _assert_states_equal(state, want)

    # corrupt file: also ignored
    with open(ckpt, "wb") as f:
        f.write(b"not a checkpoint")
    state = jobs.run_checkpointed(sched, ck, inputs, ckpt, batch_shape=(2,),
                                  every=4)
    _assert_states_equal(state, want)
