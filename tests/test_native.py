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


def _perturb(ops, col, eps):
    """Shift the col-th stream parameter by eps (params in stream order,
    Rot contributing three: p0, p1, p2)."""
    out, idx = [], 0
    for op in ops:
        kind = op[0]
        npar = 3 if kind == native.qsim.ROT else (
            1 if kind in (native.qsim.RX, native.qsim.RY, native.qsim.RZ,
                          native.qsim.PHASESHIFT) else 0)
        o = list(op) + [0, 0, 0.0, 0.0, 0.0]
        o = o[:6]
        for p in range(npar):
            if idx == col:
                o[3 + p] += eps
            idx += 1
        out.append(tuple(o))
    return out


def test_native_adjoint_grad_matches_finite_differences():
    """Adjoint Jacobian vs central finite differences on a stream mixing
    every parametrized gate kind with CZ/CNOT entanglers (float64)."""
    q = native.qsim
    wires = 3
    th = RNG.normal(size=12) * 0.7
    ops = [
        (q.RY, 0, 0, th[0]), (q.RX, 1, 0, th[1]), (q.RZ, 2, 0, th[2]),
        (q.CNOT, 0, 1), (q.CZ, 1, 2),
        (q.ROT, 1, 0, th[3], th[4], th[5]),
        (q.PHASESHIFT, 2, 0, th[6]),
        (q.CNOT, 2, 0),
        (q.ROT, 0, 0, th[7], th[8], th[9]),
        (q.RY, 2, 0, th[10]), (q.RZ, 0, 0, th[11]),
    ]
    ev, jac = native.adjoint_grad(wires, ops)
    assert jac.shape == (wires, 12)
    _, ev_check = native.statevector_run(wires, ops)
    np.testing.assert_allclose(ev, ev_check, atol=1e-12)
    eps = 1e-6
    for col in range(12):
        _, ep = native.statevector_run(wires, _perturb(ops, col, eps))
        _, em = native.statevector_run(wires, _perturb(ops, col, -eps))
        fd = (ep - em) / (2 * eps)
        np.testing.assert_allclose(jac[:, col], fd, atol=1e-6,
                                   err_msg=f"param column {col}")


def test_native_adjoint_grad_matches_jax_reupload():
    """Weight/input gradients of a re-uploading block: adjoint Jacobian
    (native, float64) vs JAX autodiff of the engine (float32)."""
    import jax

    wires, L, k = 3, 2, 2
    w = RNG.normal(size=(L, k, wires, 3)) * 0.4
    x = RNG.normal(size=(wires,))
    ops = native.build_reupload_ops(x, w, encode="rz", imprimitive="cz")
    ev, jac = native.adjoint_grad(wires, ops)

    def f(xw):
        xx, ww = xw
        return sim.reupload_block(xx[None], ww, encode="rz",
                                  imprimitive="cz", readout="expvalz")[0]

    args = (jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32))
    np.testing.assert_allclose(ev, np.asarray(f(args)), atol=1e-4)
    jx, jw = jax.jacobian(f)(args)
    # stream layout per block i: [wires encode params][k*wires*3 Rot params]
    blk = wires + k * wires * 3
    assert jac.shape == (wires, L * blk)
    jw_native = np.stack(
        [jac[:, i * blk + wires:(i + 1) * blk].reshape(wires, k, wires, 3)
         for i in range(L)], axis=1)  # (obs, L, k, wires, 3)
    np.testing.assert_allclose(jw_native, np.asarray(jw), atol=2e-3)
    # x feeds every block's encode slot: d/dx = sum over blocks
    jx_native = sum(jac[:, i * blk:i * blk + wires] for i in range(L))
    np.testing.assert_allclose(jx_native, np.asarray(jx), atol=2e-3)


def test_native_adjoint_rejects_channels():
    with pytest.raises(ValueError):
        native.adjoint_grad(
            2, [(native.qsim.RY, 0, 0, 0.3),
                (native.qsim.CH_DEPOL, 0, 0, 0.5)])
