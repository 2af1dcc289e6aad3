"""Property-based invariants of the simulator (hypothesis).

Shapes are FIXED per property (one XLA compile each); hypothesis varies the
values. Each property encodes something that must hold for EVERY input, not
just the seeds the example-based tests picked:

* unitarity: every SEL program preserves the state norm;
* probs are a distribution for every qdense input;
* composing a block to a dense unitary == applying its gates one by one;
* channels are trace-preserving for every strength in (0, 1);
* the native C++ engine and the JAX engine agree on random circuits.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from qiddm_tpu import sim
from qiddm_tpu.sim import channels as ch
from qiddm_tpu.sim.sel import sel_apply_direct, sel_unitary

WIRES, DEPTH, BATCH = 3, 2, 4
DIM = 2**WIRES

floats = st.floats(min_value=-3.0, max_value=3.0, allow_nan=False,
                   allow_infinity=False, width=32)


def weight_strategy():
    return st.lists(floats, min_size=DEPTH * WIRES * 3,
                    max_size=DEPTH * WIRES * 3).map(
        lambda v: np.asarray(v, np.float32).reshape(DEPTH, WIRES, 3))


def state_strategy():
    n = BATCH * DIM * 2
    def to_states(v):
        a = np.asarray(v, np.float64).reshape(BATCH, DIM, 2)
        s = a[..., 0] + 1j * a[..., 1]
        norms = np.linalg.norm(s, axis=1, keepdims=True)
        return (s / np.where(norms < 1e-3, 1.0, norms)).astype(np.complex64)
    return st.lists(floats, min_size=n, max_size=n).map(to_states)


@settings(max_examples=25, deadline=None)
@given(w=weight_strategy(), s=state_strategy(),
       imp=st.sampled_from(["cnot", "cz"]))
def test_sel_preserves_norm(w, s, imp):
    out = np.asarray(sel_apply_direct(jnp.asarray(s), jnp.asarray(w),
                                      imprimitive=imp))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(s, axis=1), atol=1e-4)


@settings(max_examples=25, deadline=None)
@given(w=weight_strategy(), s=state_strategy(),
       imp=st.sampled_from(["cnot", "cz"]))
def test_sel_compose_equals_gate_level(w, s, imp):
    u = np.asarray(sel_unitary(jnp.asarray(w), imprimitive=imp))
    want = s @ u.T
    got = np.asarray(sel_apply_direct(jnp.asarray(s), jnp.asarray(w),
                                      imprimitive=imp))
    np.testing.assert_allclose(got, want, atol=1e-4)


@settings(max_examples=25, deadline=None)
@given(w=weight_strategy(),
       x=st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                            width=32),
                  min_size=BATCH * 6, max_size=BATCH * 6))
def test_qdense_probs_are_distribution(w, x):
    x = np.asarray(x, np.float32).reshape(BATCH, 6)
    p = np.asarray(sim.qdense_circuit(jnp.asarray(x), jnp.asarray(w),
                                      wires=WIRES))
    assert np.all(p >= -1e-6)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)


@settings(max_examples=50, deadline=None)
@given(kind=st.sampled_from(["phase_damping", "amplitude_damping",
                             "depolarizing"]),
       strength=st.floats(min_value=1e-4, max_value=0.999, allow_nan=False))
def test_channels_trace_preserving(kind, strength):
    ks = ch.kraus_for(kind, strength)
    acc = sum(k.conj().T @ k for k in ks)
    np.testing.assert_allclose(np.asarray(acc), np.eye(2), atol=1e-7)


@settings(max_examples=15, deadline=None)
@given(w=st.lists(floats, min_size=2 * 2 * WIRES * 3,
                  max_size=2 * 2 * WIRES * 3),
       x=st.lists(floats, min_size=WIRES, max_size=WIRES))
def test_native_engine_matches_jax_engine(w, x):
    import pytest

    from qiddm_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    w = np.asarray(w, np.float32).reshape(2, 2, WIRES, 3)
    x = np.asarray(x, np.float32)
    jax_out = np.asarray(sim.reupload_block(
        jnp.asarray(x[None]), jnp.asarray(w), encode="rz", imprimitive="cz",
        readout="expvalz"))[0]
    ops = native.build_reupload_ops(x, w, encode="rz", imprimitive="cz")
    _, ev = native.statevector_run(WIRES, ops)
    np.testing.assert_allclose(jax_out, ev, atol=1e-4)
