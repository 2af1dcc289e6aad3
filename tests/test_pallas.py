"""Fused Pallas reupload-chain kernel: forward/backward parity with the
pure-jnp path (interpret mode on CPU; the real TPU path is exercised by
bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu.sim.pallas_kernels import reupload_chain_pallas
from qiddm_tpu.sim.sel import sel_layer_unitaries
from qiddm_tpu.sim.statevector import (
    apply_unitary,
    rz_phases,
    zero_state,
)

RNG = np.random.default_rng(41)


def _jnp_chain(phases, lus, k):
    L = lus.shape[0]
    states = zero_state(phases.shape[0], int(np.log2(phases.shape[1])))

    def body(states, us_l):
        states = states * phases
        for li in range(k):
            states = apply_unitary(states, us_l[li])
        return states, None

    states, _ = jax.lax.scan(body, states, lus)
    return states


@pytest.mark.parametrize("wires,L,k,B", [(3, 2, 2, 8), (4, 5, 2, 16),
                                         (5, 3, 3, 8)])
def test_fused_forward_matches_jnp(wires, L, k, B):
    w = jnp.asarray(RNG.normal(size=(L, k, wires, 3)) * 0.4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=(B, wires)), jnp.float32)
    phases = rz_phases(x, wires)
    lus = sel_layer_unitaries(w, "cz")
    want = np.asarray(_jnp_chain(phases, lus, k))
    got = np.asarray(reupload_chain_pallas(phases, lus, k, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_backward_matches_jnp():
    wires, L, k, B = 4, 3, 2, 8
    w = jnp.asarray(RNG.normal(size=(L, k, wires, 3)) * 0.4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=(B, wires)), jnp.float32)
    coeff = jnp.asarray(RNG.normal(size=(B, 2**wires)), jnp.float32)

    def loss_jnp(w, x):
        phases = rz_phases(x, wires)
        lus = sel_layer_unitaries(w, "cz")
        s = _jnp_chain(phases, lus, k)
        return jnp.sum(coeff * (jnp.real(s) ** 2 + jnp.imag(s) ** 2))

    def loss_pl(w, x):
        phases = rz_phases(x, wires)
        lus = sel_layer_unitaries(w, "cz")
        s = reupload_chain_pallas(phases, lus, k, interpret=True)
        return jnp.sum(coeff * (jnp.real(s) ** 2 + jnp.imag(s) ** 2))

    v1, g1 = jax.value_and_grad(loss_jnp, argnums=(0, 1))(w, x)
    v2, g2 = jax.value_and_grad(loss_pl, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               atol=3e-5)


def test_fused_single_layer_blocks():
    """k=1: every layer is a block start (phase before each layer)."""
    wires, L, k, B = 3, 4, 1, 4
    w = jnp.asarray(RNG.normal(size=(L, k, wires, 3)) * 0.4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=(B, wires)), jnp.float32)
    phases = rz_phases(x, wires)
    lus = sel_layer_unitaries(w, "cz")
    want = np.asarray(_jnp_chain(phases, lus, k))
    got = np.asarray(reupload_chain_pallas(phases, lus, k, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
