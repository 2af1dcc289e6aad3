"""Parameter-shift vs autodiff: on a simulator both must agree exactly
(the analytic two-term rule equals the true derivative for this ansatz)."""

import jax
import jax.numpy as jnp
import numpy as np

from qiddm_tpu import sim
from qiddm_tpu.sim.gradients import parameter_shift_grad

RNG = np.random.default_rng(17)


def test_parameter_shift_matches_autodiff_expvals():
    wires, L, k = 3, 2, 2
    w = jnp.asarray(RNG.normal(size=(L, k, wires, 3)) * 0.4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=(4, wires)), jnp.float32)
    coeff = jnp.asarray(RNG.normal(size=(wires,)), jnp.float32)

    def f(w):
        ev = sim.reupload_block(x, w, encode="rz", imprimitive="cz",
                                readout="expvalz")
        return jnp.sum(ev @ coeff)  # linear functional of expectations

    g_auto = jax.grad(f)(w)
    g_shift = parameter_shift_grad(f, w)
    np.testing.assert_allclose(np.asarray(g_shift), np.asarray(g_auto),
                               atol=2e-4)


def test_parameter_shift_matches_autodiff_probs():
    wires, depth = 3, 2
    w = jnp.asarray(RNG.normal(size=(depth, wires, 3)) * 0.4, jnp.float32)
    x = jnp.abs(jnp.asarray(RNG.normal(size=(2, 5)), jnp.float32)) + 0.1
    sel = jnp.asarray(RNG.normal(size=(2**wires,)), jnp.float32)

    def f(w):
        p = sim.qdense_circuit(x, w, wires=wires, weight_map="none")
        return jnp.sum(p @ sel)

    g_auto = jax.grad(f)(w)
    g_shift = parameter_shift_grad(f, w)
    np.testing.assert_allclose(np.asarray(g_shift), np.asarray(g_auto),
                               atol=2e-4)


def test_parameter_shift_chunked():
    wires = 2
    w = jnp.asarray(RNG.normal(size=(1, 1, wires, 3)), jnp.float32)
    x = jnp.asarray(RNG.normal(size=(2, wires)), jnp.float32)

    def f(w):
        return jnp.sum(sim.reupload_block(x, w, readout="expvalz"))

    full = parameter_shift_grad(f, w)
    chunked = parameter_shift_grad(f, w, chunk=4)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-6)
