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


# --- fused density-matrix block kernel --------------------------------------

@pytest.mark.parametrize("kind", ["amplitude_damping", "depolarizing",
                                  "phase_damping"])
@pytest.mark.parametrize("wires,L,k,B", [(3, 2, 2, 3), (4, 3, 2, 2)])
def test_dm_chain_kernel_matches_engine(kind, wires, L, k, B):
    """dm_reupload_chain_pallas (interpret mode) vs the XLA dm path of
    reupload_block for every non-unitary reference channel kind."""
    from qiddm_tpu import sim
    from qiddm_tpu.sim import density as dm
    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.pallas_dm_kernel import dm_reupload_chain_pallas

    w = jnp.asarray(RNG.normal(size=(L, k, wires, 3)) * 0.4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=(B, wires)), jnp.float32)
    noise = sim.NoiseModel(kind, 0.2, "encode")
    want = np.asarray(sim.reupload_block(x, w, encode="rz", noise=noise,
                                         readout="probs"))
    phases = rz_phases(x, wires)
    flat = w.reshape(L * k, wires, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
    rho = dm_reupload_chain_pallas(phases, mats, k, wires, kind, 0.2,
                                   interpret=True)
    got = np.asarray(dm.probs(rho))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # the channel must actually act
    clean = np.asarray(sim.reupload_block(x, w, encode="rz",
                                          readout="probs"))
    assert not np.allclose(got, clean, atol=1e-4)


def test_dm_chain_kernel_traced_strength():
    """Strength as a traced scalar (the lax.map intensity-sweep path)."""
    from qiddm_tpu import sim
    from qiddm_tpu.sim import density as dm
    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.pallas_dm_kernel import dm_reupload_chain_pallas

    wires, L, k, B = 3, 2, 2, 2
    w = jnp.asarray(RNG.normal(size=(L, k, wires, 3)) * 0.4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=(B, wires)), jnp.float32)
    phases = rz_phases(x, wires)
    flat = w.reshape(L * k, wires, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])

    def probs_at(s):
        rho = dm_reupload_chain_pallas(phases, mats, k, wires,
                                       "amplitude_damping", s,
                                       interpret=True)
        return dm.probs(rho)

    outs = jax.lax.map(probs_at, jnp.asarray([0.1, 0.4], jnp.float32))
    for i, s in enumerate([0.1, 0.4]):
        want = np.asarray(probs_at(jnp.float32(s)))
        np.testing.assert_allclose(np.asarray(outs)[i], want, atol=1e-6)


def test_dm_chain_kernel_ry_encode():
    """RY re-uploading encode (QIDDM_PL_noise1's circuit) through the
    fused dm kernel: per-sample RY coefficients on both sides of rho."""
    from qiddm_tpu import sim
    from qiddm_tpu.sim import density as dm
    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.pallas_dm_kernel import dm_reupload_chain_pallas

    wires, L, k, B = 3, 2, 2, 3
    w = jnp.asarray(RNG.normal(size=(L, k, wires, 3)) * 0.4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=(B, wires)), jnp.float32)
    for kind in ("amplitude_damping", "depolarizing", "phase_damping"):
        noise = sim.NoiseModel(kind, 0.25, "encode")
        want = np.asarray(sim.reupload_block(x, w, encode="ry", noise=noise,
                                             readout="expvalz"))
        flat = w.reshape(L * k, wires, 3)
        mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
        rho = dm_reupload_chain_pallas(None, mats, k, wires, kind, 0.25,
                                       interpret=True, ry_angles=x)
        got = np.asarray(dm.expval_z(rho))
        np.testing.assert_allclose(got, want, atol=1e-5)
