"""QASM bridge tests: emission, repetition splicing, execution, sampling."""

import numpy as np
import pytest

import oracle
from qiddm_tpu import native
from qiddm_tpu.sim import qasm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native qsim unavailable")

RNG = np.random.default_rng(31)


def test_circuit_to_qasm_structure():
    w = RNG.normal(size=(2, 3, 3))
    x = RNG.normal(size=3)
    text = qasm.circuit_to_qasm(w, 3, x)
    lines = text.strip().split("\n")
    assert lines[0] == "OPENQASM 2.0;"
    assert lines[2] == "qreg q[3];"
    assert sum(1 for l in lines if l.startswith("rx(")) == 3
    assert sum(1 for l in lines if l.startswith("cx ")) == 6  # 2 layers x 3
    assert sum(1 for l in lines if l.startswith("measure")) == 3


def test_run_qasm_matches_oracle():
    wires = 3
    w = RNG.normal(size=(2, wires, 3)) * 0.4
    x = RNG.normal(size=wires)
    probs = qasm.run_qasm(qasm.circuit_to_qasm(w, wires, x))
    # oracle: RX embed then SEL
    state = np.zeros(2**wires, complex)
    state[0] = 1.0
    rx = lambda t: np.array([[np.cos(t / 2), -1j * np.sin(t / 2)],
                             [-1j * np.sin(t / 2), np.cos(t / 2)]])
    for j in range(wires):
        state = oracle.embed_1q(rx(x[j]), j, wires) @ state
    state = oracle.sel_matrix(w, wires, "cnot") @ state
    np.testing.assert_allclose(probs, np.abs(state) ** 2, atol=1e-10)


def test_repeat_qasm_doubles_body():
    w = RNG.normal(size=(1, 2, 3))
    x = RNG.normal(size=2)
    base = qasm.circuit_to_qasm(w, 2, x)
    rep = qasm.repeat_qasm(base, 2, ancilla=False, reps=2)
    # two repetitions of the body -> twice the rx count
    assert rep.count("rx(") == 2 * base.count("rx(")
    probs = qasm.run_qasm(rep)
    assert abs(probs.sum() - 1.0) < 1e-9
    # ancilla reset path parses too
    rep_a = qasm.repeat_qasm(base, 2, ancilla=True, reps=2)
    assert "reset q[1];" in rep_a
    probs_a = qasm.run_qasm(rep_a)
    assert abs(probs_a.sum() - 1.0) < 1e-9


def test_sample_from_qasm_counts_and_bit_order():
    # single wire 0 rotated to |1> with high probability: in qiskit bit
    # order (q0 = LSB) index 1 gets the counts when wires=2 and q[0] flips
    text = "\n".join([
        "OPENQASM 2.0;", 'include "qelib1.inc";', "qreg q[2];", "creg c[2];",
        f"rx({np.pi!r}) q[0];",
        "measure q[0] -> c[0];", "measure q[1] -> c[1];", ""])
    counts = qasm.sample_from_qasm(text, shots=1000, seed=0)
    assert counts.sum() == 1000
    assert counts[1] == 1000  # q0=1, q1=0 -> qiskit index 0b01
    exact = qasm.sample_from_qasm(text, shots=None)
    np.testing.assert_allclose(exact, [0, 1, 0, 0], atol=1e-9)
