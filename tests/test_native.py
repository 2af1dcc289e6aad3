"""Native C++ qsim engine: build, run, and cross-validate against both the
numpy oracle and the JAX simulator."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from qiddm_tpu import native, sim

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native qsim unavailable: {native.qsim.build_error() if hasattr(native, 'qsim') else ''}")

RNG = np.random.default_rng(21)


def test_native_sel_matches_numpy_oracle():
    wires, layers = 3, 4
    w = RNG.normal(size=(layers, wires, 3)) * 0.4
    ops = native.build_sel_ops(w, "cnot")
    probs, ev, state = native.statevector_run(wires, ops, want_state=True)
    want = oracle.sel_matrix(w, wires, "cnot")[:, 0]
    np.testing.assert_allclose(state, want, atol=1e-12)
    np.testing.assert_allclose(probs, np.abs(want) ** 2, atol=1e-12)


def test_native_matches_jax_reupload_block():
    wires, L, k = 4, 3, 2
    w = RNG.normal(size=(L, k, wires, 3)) * 0.4
    x = RNG.normal(size=(wires,))
    jax_out = np.asarray(sim.reupload_block(
        jnp.asarray(x[None], jnp.float32), jnp.asarray(w, jnp.float32),
        encode="rz", imprimitive="cz", readout="expvalz"))[0]
    ops = native.build_reupload_ops(x, w, encode="rz", imprimitive="cz")
    _, ev = native.statevector_run(wires, ops)
    np.testing.assert_allclose(jax_out, ev, atol=1e-4)


def test_native_matches_jax_amplitude_circuit():
    wires, depth = 3, 5
    w = RNG.normal(size=(depth, wires, 3)) * 0.4
    x = np.abs(RNG.normal(size=(6,))) + 0.1
    jax_probs = np.asarray(sim.qdense_circuit(
        jnp.asarray(x[None], jnp.float32), jnp.asarray(w, jnp.float32),
        wires=wires, pad_with=0.1, weight_map="none"))[0]
    amp = oracle.amplitude_embed(x, wires, 0.1)
    ops = native.build_sel_ops(w, "cnot")
    probs, _ = native.statevector_run(wires, ops, init_amps=amp)
    np.testing.assert_allclose(jax_probs, probs, atol=1e-4)


def test_native_density_channels_match_jax():
    wires, L, k = 3, 2, 2
    w = RNG.normal(size=(L, k, wires, 3)) * 0.4
    x = RNG.normal(size=(wires,))
    for kind, strength in [("phase_damping", 0.3),
                           ("amplitude_damping", 0.2),
                           ("depolarizing", 0.5)]:
        noise = sim.NoiseModel(kind, strength, "encode")
        jax_out = np.asarray(sim.reupload_block(
            jnp.asarray(x[None], jnp.float32), jnp.asarray(w, jnp.float32),
            noise=noise, readout="probs"))[0]
        ops = native.build_reupload_ops(x, w, noise_kind=kind,
                                        noise_strength=strength)
        probs, _ = native.density_run(wires, ops)
        np.testing.assert_allclose(jax_out, probs, atol=1e-4)
        assert abs(probs.sum() - 1.0) < 1e-9


def test_native_statevector_rejects_channels():
    with pytest.raises(ValueError):
        native.statevector_run(
            2, [(native.qsim.CH_DEPOL, 0, 0, 0.5)])


def test_native_sampling_statistics():
    probs = np.array([0.5, 0.25, 0.125, 0.125])
    counts = native.sample_counts(probs, shots=100_000, seed=3)
    assert counts.sum() == 100_000
    np.testing.assert_allclose(counts / 100_000, probs, atol=0.01)
    # determinism per seed
    again = native.sample_counts(probs, shots=100_000, seed=3)
    np.testing.assert_array_equal(counts, again)
