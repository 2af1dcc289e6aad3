"""QASM bridge: emit OPENQASM 2.0 for the framework's circuits and sample
from them with the native engine.

Reference: nn/utils.py:77-129 — ``circuit_to_qasm`` builds an
AngleEmbedding + StronglyEntanglingLayers circuit on a qiskit-aer device and
dumps its QASM; ``repeat_qasm`` splices the body N times (optionally
resetting an ancilla); ``sample_from_qiskit`` executes on Aer and returns a
count vector indexed by basis state.

Here the QASM is emitted as pure text (no qiskit needed) and executed by the
framework's own native C++ engine (qiddm_tpu.native). Counts use the qiskit
bit convention the reference relies on (creg bit j = qubit j, so basis index
has qubit n-1 as its most significant bit — the reverse of the simulator's
wire-0-MSB layout).
"""

from __future__ import annotations

import math
import re
from typing import List, Optional

import numpy as np

from .sel import sel_ranges


def circuit_to_qasm(weights, wires: int, inp) -> str:
    """AngleEmbedding(X) -> SEL(weights) -> measure, as OPENQASM 2.0.

    weights: (layers, wires, 3); inp: (wires,) angles (the reference embeds
    with the default X rotation, nn/utils.py:83).
    """
    weights = np.asarray(weights)
    inp = np.asarray(inp).reshape(-1)
    layers = weights.shape[0]
    lines = [
        "OPENQASM 2.0;",
        'include "qelib1.inc";',
        f"qreg q[{wires}];",
        f"creg c[{wires}];",
    ]
    for j in range(wires):
        lines.append(f"rx({float(inp[j])!r}) q[{j}];")
    ranges = sel_ranges(layers, wires)
    for l in range(layers):
        for j in range(wires):
            phi, theta, omega = (float(v) for v in weights[l, j])
            # Rot(phi, theta, omega) = RZ(omega) RY(theta) RZ(phi)
            lines.append(f"rz({phi!r}) q[{j}];")
            lines.append(f"ry({theta!r}) q[{j}];")
            lines.append(f"rz({omega!r}) q[{j}];")
        if wires > 1:
            for j in range(wires):
                lines.append(f"cx q[{j}],q[{(j + ranges[l]) % wires}];")
    # barrier before measurement (as qiskit emits): repeat_qasm's slice
    # arithmetic (body = lines[4:-wires-1]) counts on exactly one line
    # between the last gate and the measures
    lines.append("barrier q;")
    for j in range(wires):
        lines.append(f"measure q[{j}] -> c[{j}];")
    return "\n".join(lines)


def repeat_qasm(qasm: str, wires: int, ancilla: bool, reps: int) -> str:
    """Splice the circuit body ``reps`` times (reference nn/utils.py:93-111):
    keep the 4 header lines and the trailing measurement lines, optionally
    reset the last wire before each repetition."""
    qasm_ = [l for l in qasm.split("\n")]
    while qasm_ and not qasm_[-1].strip():
        qasm_.pop()  # robust to trailing blank lines
    header = "\n".join(qasm_[0:4])
    measurements = "\n".join(qasm_[-wires:])
    body = qasm_[4: -wires - 1]
    if ancilla:
        body = [f"reset q[{wires - 1}];"] + ["barrier q;"] + body
    body = body + ["barrier q;"]
    repeated: List[str] = []
    for _ in range(reps):
        repeated += body
    return "\n".join([header, "\n".join(repeated), measurements])


_GATE_RE = re.compile(
    r"^(rx|ry|rz)\(([-+0-9.eE]+)\)\s+q\[(\d+)\];$")
_CX_RE = re.compile(r"^(cx|cz)\s+q\[(\d+)\],q\[(\d+)\];$")
_RESET_RE = re.compile(r"^reset\s+q\[(\d+)\];$")
_QREG_RE = re.compile(r"^qreg\s+q\[(\d+)\];$")


def run_qasm(qasm_str: str):
    """Execute an emitted-QASM-subset circuit on the native engine.

    Returns the probability vector in the simulator's wire-0-MSB order.
    Supported: rx/ry/rz, cx, cz, reset (projective, renormalized), barrier,
    measure (ignored — full statevector readout).
    """
    from .. import native

    wires = None
    ops = []
    for raw in qasm_str.split("\n"):
        line = raw.strip()
        if not line or line.startswith(("OPENQASM", "include", "creg",
                                       "barrier", "measure", "//")):
            continue
        m = _QREG_RE.match(line)
        if m:
            wires = int(m.group(1))
            continue
        m = _GATE_RE.match(line)
        if m:
            kind = {"rx": native.qsim.RX, "ry": native.qsim.RY,
                    "rz": native.qsim.RZ}[m.group(1)]
            ops.append(("gate", (kind, int(m.group(3)), 0,
                                 float(m.group(2)))))
            continue
        m = _CX_RE.match(line)
        if m:
            kind = native.qsim.CNOT if m.group(1) == "cx" else native.qsim.CZ
            ops.append(("gate", (kind, int(m.group(2)), int(m.group(3)))))
            continue
        m = _RESET_RE.match(line)
        if m:
            ops.append(("reset", int(m.group(1))))
            continue
        raise ValueError(f"unsupported QASM line: {line!r}")
    if wires is None:
        raise ValueError("no qreg declaration found")

    # execute in segments split at resets (reset = project wire to |0> and
    # renormalize — deterministic collapse; see COMPAT.md)
    state = None
    pending = []

    def flush(state, pending):
        if not pending and state is not None:
            return state
        _, _, state = __run_segment(wires, pending, state)
        return state

    for item in ops:
        if item[0] == "gate":
            pending.append(item[1])
        else:
            state = flush(state, pending)
            pending = []
            state = _project_zero(state, wires, item[1])
    state = flush(state, pending)
    if state is None:
        state = np.zeros(2**wires, complex)
        state[0] = 1.0
    return np.abs(state) ** 2


def __run_segment(wires, gate_ops, init_state):
    from .. import native

    return native.statevector_run(wires, gate_ops, init_amps=init_state,
                                  want_state=True)


def _project_zero(state, wires: int, wire: int):
    """Deterministic reset: collapse to the |0> branch when it has weight,
    otherwise the wire was (almost) surely |1> — measurement yields 1 and the
    reset flips it, i.e. the |1>-branch amplitudes move to the |0> slots."""
    if state is None:
        state = np.zeros(2**wires, complex)
        state[0] = 1.0
        return state
    bit = 1 << (wires - 1 - wire)
    idx = np.arange(2**wires)
    is1 = (idx & bit).astype(bool)
    s0 = np.where(is1, 0.0, state)
    p0 = float(np.sum(np.abs(s0) ** 2))
    if p0 > 1e-12:
        return s0 / np.sqrt(p0)
    moved = np.zeros_like(state)
    zero_slots = idx[~is1]
    moved[zero_slots] = state[zero_slots | bit]
    n = np.linalg.norm(moved)
    return moved / max(n, 1e-300)


def sample_from_qasm(qasm_str: str, shots: Optional[int] = None,
                     seed: int = 0) -> np.ndarray:
    """Counts vector indexed like the reference's ``sample_from_qiskit``
    (nn/utils.py:114-129): index i's bits follow the qiskit creg convention
    (qubit 0 = least significant bit). ``shots=None`` returns exact
    probabilities scaled by 1 (statevector backend analogue)."""
    probs = run_qasm(qasm_str)
    wires = int(math.log2(len(probs)))
    # reverse bit order: our wire-0-MSB index -> qiskit q0-LSB index
    perm = np.zeros(len(probs), np.int64)
    for i in range(len(probs)):
        rev = 0
        for b in range(wires):
            if i & (1 << b):
                rev |= 1 << (wires - 1 - b)
        perm[rev] = i
    probs_q = probs[perm]
    if shots is None:
        return probs_q
    from .. import native

    return native.sample_counts(probs_q, shots, seed).astype(np.float32)
