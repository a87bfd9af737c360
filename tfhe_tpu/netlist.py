"""Gate netlists: build encrypted boolean circuits, schedule, batch-execute.

The execution model that makes TFHE fast on TPU is BATCHING: every
bootstrapped gate call should carry as many independent gates as possible.
This module turns an arbitrary netlist into maximal batches — gates are
levelized (topological) and same-type gates within a level are grouped, so
the executor issues ONE batched gate call per (level, type) group.

Scheduling is control-plane CPU work; for realistic circuits (millions of
gates) it runs in the native C++ scheduler (native/circuit_scheduler.cc,
built on demand, loaded via ctypes) with a pure-Python fallback kept
behaviorally identical (differentially tested).

No reference analogue: the reference evaluates gates one at a time in user
code (examples/tutorial.jl:50-62).
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import gates as gate_lib
from .api import CloudKey
from .lwe import LweSample

# Gate type ids (batch keys). MUX is 3-input; NOT/CONST are cheap specials.
GATE_TYPES = (
    "nand", "and", "or", "xor", "xnor", "nor",
    "andny", "andyn", "orny", "oryn", "mux", "not", "const",
)
_TYPE_ID = {name: i for i, name in enumerate(GATE_TYPES)}
_GATE_FN = {
    "nand": gate_lib.gate_nand, "and": gate_lib.gate_and,
    "or": gate_lib.gate_or, "xor": gate_lib.gate_xor,
    "xnor": gate_lib.gate_xnor, "nor": gate_lib.gate_nor,
    "andny": gate_lib.gate_andny, "andyn": gate_lib.gate_andyn,
    "orny": gate_lib.gate_orny, "oryn": gate_lib.gate_oryn,
}


class Circuit:
    """A boolean circuit over wire ids.

    new_wire()/input() allocate wires; gate methods (nand, xor, mux, ...)
    append gates and return the output wire. compile() produces a batched
    Schedule; Schedule.run() executes it over encrypted inputs.
    """

    def __init__(self):
        self.n_wires = 0
        self.gate_type: list[int] = []
        self.fanin: list[tuple[int, int, int]] = []
        self.out_wire: list[int] = []
        self.const_value: dict[int, bool] = {}  # gate index -> plaintext bool

    def new_wire(self) -> int:
        self.n_wires += 1
        return self.n_wires - 1

    def input(self) -> int:
        return self.new_wire()

    def inputs(self, n: int) -> list[int]:
        return [self.new_wire() for _ in range(n)]

    def _gate(self, name: str, ins: tuple) -> int:
        out = self.new_wire()
        padded = tuple(ins) + (-1,) * (3 - len(ins))
        self.gate_type.append(_TYPE_ID[name])
        self.fanin.append(padded)
        self.out_wire.append(out)
        return out

    def __getattr__(self, name):
        # two-input gate methods: circ.nand(a, b), circ.xor(a, b), and the
        # keyword-safe aliases circ.and_/or_(a, b)
        if name in ("mux", "not_", "const_"):
            raise AttributeError(name)
        base = name.rstrip("_")
        if base in _TYPE_ID and base not in ("mux", "not", "const"):
            return lambda a, b: self._gate(base, (a, b))
        raise AttributeError(name)

    def mux(self, sel: int, a: int, b: int) -> int:
        """sel ? a : b (reference: src/gates.jl:163-177)."""
        return self._gate("mux", (sel, a, b))

    def not_(self, a: int) -> int:
        return self._gate("not", (a,))

    def const_(self, value: bool) -> int:
        """Noiseless plaintext constant wire (reference: src/gates.jl:91-93)."""
        w = self._gate("const", ())
        self.const_value[len(self.gate_type) - 1] = bool(value)
        return w

    def compile(self, use_native: Optional[bool] = None,
                outputs=None) -> "Schedule":
        """Levelize + batch the netlist; optionally assign storage slots.

        outputs: wire ids the caller will read after run(). When given, the
        schedule also carries a wire->slot map (native linear-scan
        allocation, dead wires' slots reused) so run() streams through a
        [*batch, n_slots, ...] state instead of materializing every wire —
        n_slots is typically the circuit's live width, << n_wires for deep
        circuits. Without it, run() keeps the dense all-wires state.
        """
        n_gates = len(self.gate_type)
        gtype = np.asarray(self.gate_type, np.int32)
        fanin = np.asarray(self.fanin, np.int32).reshape(n_gates, 3)
        outw = np.asarray(self.out_wire, np.int32)
        if use_native is None:
            use_native = _native_lib() is not None
        if use_native:
            sched = _schedule_native(n_gates, gtype, fanin, outw, self.n_wires)
        else:
            sched = _schedule_python(n_gates, gtype, fanin, outw, self.n_wires)
        order, starts, types, levels = sched
        wire_slot, n_slots = None, self.n_wires
        if outputs is not None:
            keep = np.asarray(list(outputs), np.int32)
            if use_native:
                wire_slot, n_slots = _assign_slots_native(
                    n_gates, fanin, outw, self.n_wires, order, starts,
                    len(types), keep)
            else:
                wire_slot, n_slots = _assign_slots_python(
                    n_gates, fanin, outw, self.n_wires, order, starts,
                    len(types), keep)
        return Schedule(self, order, starts, types, levels, wire_slot, n_slots)


def build_ripple_adder(circ: Circuit, a_wires, b_wires):
    """a + b (mod 2^bits) as a ripple-carry netlist; returns sum wires.

    Depth O(bits): the standard full-adder chain (sum via two XORs, carry
    via MUX). Good gate count, poor batching — each bit level is its own
    scheduled batch.
    """
    bits = len(a_wires)
    carry = None
    out = []
    for i in range(bits):
        axb = circ.xor(a_wires[i], b_wires[i])
        if carry is None:
            out.append(axb)
            carry = circ.and_(a_wires[i], b_wires[i])
        else:
            out.append(circ.xor(axb, carry))
            if i + 1 < bits:
                carry = circ.mux(axb, carry, a_wires[i])
    return out


def build_kogge_stone_adder(circ: Circuit, a_wires, b_wires):
    """a + b (mod 2^bits) as a parallel-prefix (Kogge-Stone) netlist.

    Depth O(log bits) instead of O(bits): all bits' generate/propagate
    pairs combine in log2(bits) prefix levels, and every level is a wide
    same-type gate batch — exactly what the batched TPU executor wants:
    one bootstrapped call per (level, type), so a 64-bit add is 35 wide
    batches over 13 levels instead of ripple's 127 narrow batches over 64.
    Gate count is O(bits log bits) (~5.7x ripple at 64 bits), so prefer
    ripple when total bootstraps dominate (huge word batches) and this
    form when dispatch depth / latency dominates (narrow batches).
    """
    bits = len(a_wires)
    g = [circ.and_(a_wires[i], b_wires[i]) for i in range(bits)]
    p = [circ.xor(a_wires[i], b_wires[i]) for i in range(bits)]
    sums = [p[0]]
    # prefix levels: after level d, (g[i], p[i]) spans bits [i-2^d+1 .. i]
    gg, pp = list(g), list(p)
    d = 1
    while d < bits:
        ng, np_ = list(gg), list(pp)
        for i in range(d, bits):
            t = circ.and_(pp[i], gg[i - d])
            ng[i] = circ.or_(gg[i], t)
            if i - d >= d:  # p only needed while it still feeds combines
                np_[i] = circ.and_(pp[i], pp[i - d])
        gg, pp = ng, np_
        d *= 2
    # carry into bit i is the full prefix generate of bits [0 .. i-1]
    for i in range(1, bits):
        sums.append(circ.xor(p[i], gg[i - 1]))
    return sums


def _native_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "native", "build", "libtfhe_circuit.so")


_LIB = None


def _native_lib():
    """Load (building on demand) the C++ scheduler; None if unavailable.

    `make -C native` always runs first (make's own mtime check keeps it a
    no-op when the .so is current) so an edited circuit_scheduler.cc is never
    shadowed by a stale binary; build artifacts are gitignored, never
    committed.
    """
    global _LIB
    if _LIB is not None:
        return _LIB or None
    path = _native_path()
    src_dir = os.path.dirname(os.path.dirname(path))
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(path):
            _LIB = False
            return None
    try:
        lib = ctypes.CDLL(path)
        lib.tfhe_schedule_circuit.restype = ctypes.c_int32
        _LIB = lib
    except OSError:
        _LIB = False
        return None
    return _LIB


def _schedule_native(n_gates, gtype, fanin, outw, n_wires):
    lib = _native_lib()
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    order = np.zeros(n_gates, np.int32)
    starts = np.zeros(n_gates + 1, np.int32)
    types = np.zeros(max(n_gates, 1), np.int32)
    levels = np.zeros(max(n_gates, 1), np.int32)
    nb = np.zeros(1, np.int32)
    lib.tfhe_schedule_circuit.argtypes = [
        ctypes.c_int32, i32p, i32p, i32p, ctypes.c_int32,
        i32p, i32p, i32p, i32p, i32p,
    ]
    rc = lib.tfhe_schedule_circuit(
        n_gates, np.ascontiguousarray(gtype),
        np.ascontiguousarray(fanin.reshape(-1)),
        np.ascontiguousarray(outw), n_wires,
        order, starts, types, levels, nb,
    )
    if rc != 0:
        raise ValueError(f"circuit scheduling failed (rc={rc}: "
                         f"{'cycle' if rc == -1 else 'invalid netlist'})")
    n = int(nb[0])
    return order, starts[: n + 1], types[:n], levels[:n]


def _assign_slots_native(n_gates, fanin, outw, n_wires, order, starts,
                         n_batches, keep):
    lib = _native_lib()
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    wire_slot = np.zeros(n_wires, np.int32)
    n_slots = np.zeros(1, np.int32)
    lib.tfhe_assign_slots.restype = ctypes.c_int32
    lib.tfhe_assign_slots.argtypes = [
        ctypes.c_int32, i32p, i32p, ctypes.c_int32,
        i32p, i32p, ctypes.c_int32, i32p, ctypes.c_int32, i32p, i32p,
    ]
    rc = lib.tfhe_assign_slots(
        n_gates, np.ascontiguousarray(fanin.reshape(-1)),
        np.ascontiguousarray(outw), n_wires,
        np.ascontiguousarray(order), np.ascontiguousarray(starts),
        n_batches, np.ascontiguousarray(keep),
        len(keep), wire_slot, n_slots,
    )
    if rc != 0:
        raise ValueError(f"slot assignment failed (rc={rc})")
    return wire_slot, int(n_slots[0])


def _assign_slots_python(n_gates, fanin, outw, n_wires, order, starts,
                         n_batches, keep):
    """Reference slot allocator (identical semantics to the C++ one)."""
    INF = np.iinfo(np.int32).max
    writer = np.full(n_wires, -1, np.int64)
    writer[outw] = np.arange(n_gates)
    gate_batch = np.full(n_gates, -1, np.int64)
    for b in range(n_batches):
        gate_batch[order[starts[b]: starts[b + 1]]] = b
    last_use = np.full(n_wires, -1, np.int64)
    for g in range(n_gates):
        for w in fanin[g]:
            if w >= 0:
                last_use[w] = max(last_use[w], gate_batch[g])
    last_use[np.asarray(keep, np.int64)] = INF

    wire_slot = np.full(n_wires, -1, np.int32)
    free: list[int] = []
    next_slot = 0

    def alloc(w):
        nonlocal next_slot
        if free:
            wire_slot[w] = free.pop()
        else:
            wire_slot[w] = next_slot
            next_slot += 1

    for w in range(n_wires):
        if writer[w] < 0 and last_use[w] != -1:
            alloc(w)
    dies: list[list[int]] = [[] for _ in range(n_batches)]
    for w in range(n_wires):
        if 0 <= last_use[w] < INF:
            dies[last_use[w]].append(w)
    peak = next_slot
    for b in range(n_batches):
        for p in range(starts[b], starts[b + 1]):
            w = int(outw[order[p]])
            if last_use[w] == -1:
                last_use[w] = b
                dies[b].append(w)
            alloc(w)
        peak = max(peak, next_slot)
        for w in dies[b]:
            free.append(int(wire_slot[w]))
    return wire_slot, peak


def _schedule_python(n_gates, gtype, fanin, outw, n_wires):
    """Reference scheduler (identical batching semantics to the C++ one)."""
    writer = np.full(n_wires, -1, np.int64)
    writer[outw] = np.arange(n_gates)
    deps = np.zeros(n_gates, np.int64)
    consumers: list[list[int]] = [[] for _ in range(n_gates)]
    for g in range(n_gates):
        for w in fanin[g]:
            if w >= 0 and writer[w] >= 0:
                deps[g] += 1
                consumers[writer[w]].append(g)
    frontier = [g for g in range(n_gates) if deps[g] == 0]
    order, starts, types, levels = [], [0], [], []
    lv = 0
    scheduled = 0
    while frontier:
        by_type: dict[int, list[int]] = {}
        for g in sorted(frontier):
            by_type.setdefault(int(gtype[g]), []).append(g)
        for ty in sorted(by_type):
            order.extend(by_type[ty])
            starts.append(len(order))
            types.append(ty)
            levels.append(lv)
        nxt = []
        for g in frontier:
            scheduled += 1
            for c in consumers[g]:
                deps[c] -= 1
                if deps[c] == 0:
                    nxt.append(c)
        frontier = nxt
        lv += 1
    if scheduled != n_gates:
        raise ValueError("circuit scheduling failed (rc=-1: cycle)")
    return (np.asarray(order, np.int32), np.asarray(starts, np.int32),
            np.asarray(types, np.int32), np.asarray(levels, np.int32))


@dataclasses.dataclass
class Schedule:
    """Compiled batched execution plan for a Circuit.

    wire_slot/n_slots (set by compile(outputs=...)) map wires onto a reused
    slot pool so run() streams with peak-live memory instead of all-wires
    memory; None keeps the dense layout.
    """

    circuit: Circuit
    gate_order: np.ndarray
    batch_start: np.ndarray
    batch_type: np.ndarray
    batch_level: np.ndarray
    wire_slot: Optional[np.ndarray] = None
    n_slots: int = 0

    @property
    def n_batches(self) -> int:
        return len(self.batch_type)

    def _slot(self, w):
        """Wire -> state row (identity in dense mode)."""
        if self.wire_slot is None:
            return w
        return self.wire_slot[w]

    def init_state(self, ck: CloudKey, inputs: dict[int, LweSample],
                   batch_shape=()) -> LweSample:
        """Build the initial wire state from encrypted inputs.

        The state is ONE stacked LweSample [*batch_shape, rows, ...] (rows =
        slot count in streamed mode, wire count otherwise) — the only mutable
        object of a job, which makes it the exact checkpoint/resume unit
        (utils/jobs.py)."""
        circ = self.circuit
        n = ck.params.lwe_size
        rows = self.n_slots if self.wire_slot is not None else circ.n_wires
        # wire state as one stacked LweSample [*batch, rows, n]
        a = jnp.zeros(batch_shape + (rows, n), jnp.int32)
        b = jnp.zeros(batch_shape + (rows,), jnp.int32)
        cv = jnp.zeros(batch_shape + (rows,), jnp.float32)
        for w, ct in inputs.items():
            s = self._slot(w)
            a = a.at[..., s, :].set(ct.a)
            b = b.at[..., s].set(ct.b)
            cv = cv.at[..., s].set(ct.cv)
        return LweSample(a, b, cv)

    def _mapped_netlist(self):
        """fanin/out-wire arrays remapped into state rows."""
        circ = self.circuit
        fanin = np.asarray(circ.fanin, np.int32)
        outw = np.asarray(circ.out_wire, np.int32)
        if self.wire_slot is not None:
            fanin = np.where(fanin >= 0, self.wire_slot[fanin], -1)
            outw = self.wire_slot[outw]
        return fanin, outw

    def run(self, ck: CloudKey, inputs: dict[int, LweSample],
            batch_shape=()) -> LweSample:
        """Execute over encrypted inputs: {wire: LweSample[batch_shape]}.

        Returns the full wire state as ONE stacked LweSample of shape
        [*batch_shape, n_wires, ...] — extract individual wires with
        `Schedule.wire(state, w)`. Each scheduled batch issues ONE batched
        gate call over (batch_shape x gates_in_batch).
        """
        state = self.init_state(ck, inputs, batch_shape)
        return self.run_batches(ck, state, 0, self.n_batches)

    def run_batches(self, ck: CloudKey, state: LweSample, lo_batch: int,
                    hi_batch: int) -> LweSample:
        """Execute scheduled batches [lo_batch, hi_batch) on a wire state.

        Exact resume point for restartable jobs: running [0, k) then [k, nb)
        on the saved state is bitwise identical to one [0, nb) run (gate
        evaluation is deterministic given the cloud key)."""
        circ = self.circuit
        a, b, cv = state.a, state.b, state.cv
        fanin, outw = self._mapped_netlist()

        for bi in range(lo_batch, hi_batch):
            lo, hi = int(self.batch_start[bi]), int(self.batch_start[bi + 1])
            gsel = self.gate_order[lo:hi]
            ty = GATE_TYPES[int(self.batch_type[bi])]
            ins = fanin[gsel]
            outs = outw[gsel]

            def pick(col):
                idx = ins[:, col]
                return LweSample(a[..., idx, :], b[..., idx], cv[..., idx])

            if ty == "const":
                vals = np.asarray(
                    [circ.const_value[int(g)] for g in gsel], bool)
                res = gate_lib.gate_constant(
                    ck, jnp.asarray(vals), b.shape[:-1] + (len(gsel),))
            elif ty == "not":
                res = gate_lib.gate_not(ck, pick(0))
            elif ty == "mux":
                res = gate_lib.gate_mux(ck, pick(0), pick(1), pick(2))
            else:
                res = _GATE_FN[ty](ck, pick(0), pick(1))
            a = a.at[..., outs, :].set(res.a)
            b = b.at[..., outs].set(res.b)
            cv = cv.at[..., outs].set(res.cv)

        return LweSample(a, b, cv)

    def wire(self, state: LweSample, w) -> LweSample:
        """Extract wire(s) w from the run() output state."""
        w = self._slot(np.asarray(w))
        return LweSample(state.a[..., w, :], state.b[..., w], state.cv[..., w])
