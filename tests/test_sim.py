"""Simulator parity tests: qiddm_tpu.sim vs analytic results and the numpy
oracle (tests/oracle.py), covering the gate semantics the reference relies on
through PennyLane (SURVEY §4 test-strategy notes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from qiddm_tpu import sim
from qiddm_tpu.sim import channels as ch
from qiddm_tpu.sim import density as dmod
from qiddm_tpu.sim.sel import cnot_ring_perm, cz_ring_signs, sel_ranges

RNG = np.random.default_rng(0)


def rand_weights(*shape):
    return RNG.normal(size=shape) * 0.4


# --- gates -----------------------------------------------------------------

def test_rot_matrix_matches_zyz():
    phi, theta, omega = 0.3, -1.1, 2.2
    got = np.asarray(sim.rot_matrix(phi, theta, omega))
    want = oracle.rot(phi, theta, omega)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rz_ry_matrices():
    t = 0.7
    np.testing.assert_allclose(np.asarray(sim.rz_matrix(t)), oracle.rz(t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sim.ry_matrix(t)), oracle.ry(t), atol=1e-6)


def test_apply_1q_matches_full_space():
    wires = 3
    state = RNG.normal(size=2**wires) + 1j * RNG.normal(size=2**wires)
    state /= np.linalg.norm(state)
    g = oracle.rot(0.1, 0.5, -0.3)
    for wire in range(wires):
        got = np.asarray(
            sim.apply_1q(jnp.asarray(state[None], dtype=jnp.complex64),
                         jnp.asarray(g, dtype=jnp.complex64), wire, wires)
        )[0]
        want = oracle.embed_1q(g, wire, wires) @ state
        np.testing.assert_allclose(got, want, atol=1e-6)


# --- SEL -------------------------------------------------------------------

def test_sel_ranges_cycle():
    assert sel_ranges(5, 4) == [1, 2, 3, 1, 2]
    assert sel_ranges(3, 2) == [1, 1, 1]
    assert sel_ranges(2, 1) == [0, 0]


@pytest.mark.parametrize("wires", [1, 2, 3, 4])
@pytest.mark.parametrize("imprimitive", ["cnot", "cz"])
@pytest.mark.parametrize("layers", [1, 2, 3])
def test_sel_unitary_vs_oracle(wires, imprimitive, layers):
    w = rand_weights(layers, wires, 3)
    got = np.asarray(sim.sel_unitary(jnp.asarray(w), imprimitive=imprimitive))
    want = oracle.sel_matrix(w, wires, imprimitive=imprimitive)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sel_unitary_is_unitary():
    w = rand_weights(4, 3, 3)
    u = np.asarray(sim.sel_unitary(jnp.asarray(w)))
    np.testing.assert_allclose(u @ u.conj().T, np.eye(8), atol=1e-5)


def test_sel_direct_matches_unitary():
    wires, layers, batch = 3, 4, 5
    w = jnp.asarray(rand_weights(layers, wires, 3))
    states = RNG.normal(size=(batch, 2**wires)) + 1j * RNG.normal(size=(batch, 2**wires))
    states /= np.linalg.norm(states, axis=1, keepdims=True)
    states = jnp.asarray(states, dtype=jnp.complex64)
    for imp in ("cnot", "cz"):
        via_u = sim.apply_unitary(states, sim.sel_unitary(w, imprimitive=imp))
        direct = sim.sel_apply_direct(states, w, imprimitive=imp)
        np.testing.assert_allclose(np.asarray(via_u), np.asarray(direct), atol=1e-5)


def test_cnot_ring_perm_and_cz_signs_vs_oracle():
    wires = 3
    for rng_ in (1, 2):
        # CNOT ring as permutation
        dim = 2**wires
        u = np.eye(dim, dtype=np.complex128)
        for j in range(wires):
            u = oracle.embed_ctrl(oracle.X, j, (j + rng_) % wires, wires) @ u
        inv = cnot_ring_perm(wires, rng_)
        # U_ring @ M == M[inv, :] for any M
        m = RNG.normal(size=(dim, dim))
        np.testing.assert_allclose(u @ m, m[np.asarray(inv), :], atol=1e-12)
        # CZ ring diagonal
        uz = np.eye(dim, dtype=np.complex128)
        for j in range(wires):
            uz = oracle.embed_ctrl(oracle.Z, j, (j + rng_) % wires, wires) @ uz
        np.testing.assert_allclose(np.diag(uz), cz_ring_signs(wires, rng_), atol=1e-12)


# --- embeddings / measurements --------------------------------------------

def test_amplitude_embed_pad_and_normalize():
    x = np.abs(RNG.normal(size=(2, 5)))
    got = np.asarray(sim.amplitude_embed(jnp.asarray(x, jnp.float32), 3, pad_with=0.1))
    for b in range(2):
        want = oracle.amplitude_embed(x[b], 3, 0.1)
        np.testing.assert_allclose(got[b], want, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-6)


def test_rz_encode_matches_oracle():
    wires, batch = 4, 3
    angles = RNG.normal(size=(batch, wires))
    state = RNG.normal(size=2**wires) + 1j * RNG.normal(size=2**wires)
    state /= np.linalg.norm(state)
    states = jnp.asarray(np.tile(state, (batch, 1)), dtype=jnp.complex64)
    got = np.asarray(sim.rz_encode(states, jnp.asarray(angles, jnp.float32)))
    for b in range(batch):
        want = oracle.rz_encode_state(state.copy(), angles[b], wires)
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_ry_product_state():
    wires = 3
    x = RNG.normal(size=(2, wires))
    got = np.asarray(sim.ry_product_state(jnp.asarray(x, jnp.float32), wires))
    for b in range(2):
        state = np.zeros(2**wires, dtype=np.complex128)
        state[0] = 1.0
        for j in range(wires):
            state = oracle.embed_1q(oracle.ry(x[b, j]), j, wires) @ state
        np.testing.assert_allclose(got[b], state, atol=1e-6)


def test_expval_z_matches_oracle():
    wires = 3
    state = RNG.normal(size=2**wires) + 1j * RNG.normal(size=2**wires)
    state /= np.linalg.norm(state)
    got = np.asarray(sim.expval_z(jnp.asarray(state[None], jnp.complex64)))[0]
    np.testing.assert_allclose(got, oracle.expval_z(state, wires), atol=1e-5)


# --- circuits --------------------------------------------------------------

def test_qdense_circuit_vs_oracle():
    wires, depth, batch = 3, 2, 4
    n_feat = 6
    w = rand_weights(depth, wires, 3)
    x = np.abs(RNG.normal(size=(batch, n_feat))) + 0.05
    got = np.asarray(
        sim.qdense_circuit(jnp.asarray(x, jnp.float32), jnp.asarray(w),
                           wires=wires, pad_with=0.1, weight_map="qw_tanh")
    )
    mapped = np.pi * np.tanh(w)
    u = oracle.sel_matrix(mapped, wires, "cnot")
    for b in range(batch):
        state = u @ oracle.amplitude_embed(x[b], wires, 0.1)
        np.testing.assert_allclose(got[b], oracle.probs(state), atol=1e-5)


def test_reupload_block_vs_oracle():
    wires, L, k, batch = 3, 2, 2, 3
    w = rand_weights(L, k, wires, 3)
    x = RNG.normal(size=(batch, wires))
    got_p = np.asarray(
        sim.reupload_block(jnp.asarray(x, jnp.float32), jnp.asarray(w),
                           encode="rz", imprimitive="cz", readout="probs")
    )
    got_e = np.asarray(
        sim.reupload_block(jnp.asarray(x, jnp.float32), jnp.asarray(w),
                           encode="rz", imprimitive="cz", readout="expvalz")
    )
    for b in range(batch):
        state = np.zeros(2**wires, dtype=np.complex128)
        state[0] = 1.0
        for i in range(L):
            state = oracle.rz_encode_state(state, x[b], wires)
            state = oracle.sel_matrix(w[i], wires, "cz") @ state
        np.testing.assert_allclose(got_p[b], oracle.probs(state), atol=1e-5)
        np.testing.assert_allclose(got_e[b], oracle.expval_z(state, wires), atol=1e-5)


def test_qnn_circuit_input_independence():
    """Reference QNN applies RZ encoding to |0..0> — a global phase — so the
    circuit output must be input independent (nn/qdense.py:338-344)."""
    wires, depth = 3, 2
    w = jnp.asarray(rand_weights(depth, wires, 3))
    x1 = jnp.asarray(RNG.normal(size=(2, wires)), jnp.float32)
    x2 = jnp.asarray(RNG.normal(size=(2, wires)), jnp.float32)
    out1 = np.asarray(sim.qnn_circuit(x1, w))
    out2 = np.asarray(sim.qnn_circuit(x2, w))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


# --- channels / density ----------------------------------------------------

def test_kraus_completeness():
    for kind, s in [("phase_damping", 0.3), ("amplitude_damping", 0.2),
                    ("depolarizing", 0.9), ("phase_shift", 0.5)]:
        ks = ch.kraus_for(kind, s)
        total = sum(k.conj().T @ k for k in ks)
        np.testing.assert_allclose(total, np.eye(2), atol=1e-12)


def test_density_kraus_vs_oracle():
    wires = 2
    state = RNG.normal(size=2**wires) + 1j * RNG.normal(size=2**wires)
    state /= np.linalg.norm(state)
    rho0 = np.outer(state, state.conj())
    for kind, s in [("phase_damping", 0.3), ("amplitude_damping", 0.2),
                    ("depolarizing", 0.4)]:
        ks = ch.kraus_for(kind, s)
        rho_j = dmod.from_statevector(jnp.asarray(state[None], jnp.complex64))
        rho_j = dmod.apply_kraus_all_wires(rho_j, jnp.asarray(np.stack(ks), jnp.complex64))
        want = rho0.copy()
        for wire in range(wires):
            want = oracle.apply_kraus(want, ks, wire, wires)
        np.testing.assert_allclose(np.asarray(rho_j)[0], want, atol=1e-5)
        # trace preserved
        assert abs(np.trace(np.asarray(rho_j)[0]) - 1.0) < 1e-5


def test_reupload_block_dm_matches_sv_when_unitary_noise():
    """rot_angle noise is unitary: sv path must equal explicitly-built dm."""
    wires, L, k, batch = 2, 2, 2, 2
    w = jnp.asarray(rand_weights(L, k, wires, 3))
    x = jnp.asarray(RNG.normal(size=(batch, wires)), jnp.float32)
    noise = sim.NoiseModel("rot_angle", 0.1, "encode")
    got = np.asarray(sim.reupload_block(x, w, noise=noise, readout="expvalz"))
    # manual: same circuit with shifted angles
    want = np.asarray(sim.reupload_block(x + 0.1, w, readout="expvalz"))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_reupload_block_dm_noise_reduces_purity():
    wires, L, k, batch = 3, 2, 2, 2
    w = jnp.asarray(rand_weights(L, k, wires, 3))
    x = jnp.asarray(RNG.normal(size=(batch, wires)), jnp.float32)
    noise = sim.NoiseModel("depolarizing", 0.9, "encode")
    p = np.asarray(sim.reupload_block(x, w, noise=noise, readout="probs"))
    # heavy depolarizing pushes probs toward uniform
    np.testing.assert_allclose(p, np.full_like(p, 1 / 2**wires), atol=0.05)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_dm_zero_noise_matches_sv():
    wires, L, k, batch = 2, 2, 2, 3
    w = jnp.asarray(rand_weights(L, k, wires, 3))
    x = jnp.asarray(RNG.normal(size=(batch, wires)), jnp.float32)
    noise = sim.NoiseModel("amplitude_damping", 0.0, "encode")
    got = np.asarray(sim.reupload_block(x, w, noise=noise, readout="expvalz"))
    want = np.asarray(sim.reupload_block(x, w, readout="expvalz"))
    np.testing.assert_allclose(got, want, atol=1e-5)


# --- differentiability -----------------------------------------------------

def test_autodiff_through_reupload_block():
    wires, L, k = 3, 2, 2
    w = jnp.asarray(rand_weights(L, k, wires, 3), jnp.float32)
    x = jnp.asarray(RNG.normal(size=(4, wires)), jnp.float32)

    def loss(w):
        return jnp.sum(sim.reupload_block(x, w, readout="expvalz") ** 2)

    g = jax.grad(loss)(w)
    assert g.shape == w.shape
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0

    # finite-difference check on one coordinate
    eps = 1e-3
    idx = (0, 0, 1, 1)
    wp = w.at[idx].add(eps)
    wm = w.at[idx].add(-eps)
    fd = (loss(wp) - loss(wm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[idx], fd, rtol=2e-2, atol=2e-3)


def test_autodiff_through_qdense():
    wires, depth = 3, 2
    w = jnp.asarray(rand_weights(depth, wires, 3), jnp.float32)
    x = jnp.abs(jnp.asarray(RNG.normal(size=(2, 6)), jnp.float32)) + 0.1

    vec = jnp.asarray(RNG.normal(size=(2**wires,)), jnp.float32)

    def loss(w):
        return jnp.sum(sim.qdense_circuit(x, w, wires=wires) @ vec)

    g = jax.grad(loss)(w)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_engine_compose_and_direct_paths_agree():
    """batch >= dim triggers unitary composition; batch < dim applies
    per-layer unitaries. Both must agree with each other."""
    wires, L, k = 2, 3, 2
    w = jnp.asarray(rand_weights(L, k, wires, 3), jnp.float32)
    x_small = jnp.asarray(RNG.normal(size=(2, wires)), jnp.float32)  # direct
    x_big = jnp.tile(x_small, (4, 1))  # batch 8 >= dim 4 -> compose
    out_small = np.asarray(sim.reupload_block(x_small, w, readout="expvalz"))
    out_big = np.asarray(sim.reupload_block(x_big, w, readout="expvalz"))
    np.testing.assert_allclose(out_big[:2], out_small, atol=1e-5)
    np.testing.assert_allclose(out_big[2:4], out_small, atol=1e-5)


def test_reupload_wide_gate_level_route_matches_default():
    """Above config.pallas_max_wires() the engine applies SEL gate-by-gate
    (scan over L, no per-layer (d, d) unitaries). Force the route by
    lowering the cap and check it matches the per-layer-unitary path for
    every encode/imprimitive/readout combination."""
    from qiddm_tpu import config

    wires, L, k, batch = 5, 3, 2, 4
    w = jnp.asarray(rand_weights(L, k, wires, 3), jnp.float32)
    x = jnp.asarray(RNG.normal(size=(batch, wires)), jnp.float32)
    combos = [("rz", "cz", "probs"), ("rz", "cz", "expvalz"),
              ("rz_halfpi", "cz", "probs"), ("ry", "cnot", "expvalz")]
    ref = [np.asarray(sim.reupload_block(x, w, encode=e, imprimitive=imp,
                                         readout=r)) for e, imp, r in combos]
    old = config.pallas_max_wires()
    try:
        config.set_pallas_max_wires(4)  # wires=5 > cap -> gate-level route
        wide = [np.asarray(sim.reupload_block(x, w, encode=e, imprimitive=imp,
                                              readout=r))
                for e, imp, r in combos]
    finally:
        config.set_pallas_max_wires(old)
    for a, b in zip(wide, ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_reupload_wide_gate_level_route_gradients():
    """The wide route must stay differentiable (scan-of-scan program)."""
    from qiddm_tpu import config

    wires, L, k, batch = 5, 2, 2, 3
    w = jnp.asarray(rand_weights(L, k, wires, 3), jnp.float32)
    x = jnp.asarray(RNG.normal(size=(batch, wires)), jnp.float32)

    def loss(w):
        return jnp.mean(sim.reupload_block(x, w, readout="expvalz") ** 2)

    g_ref = np.asarray(jax.grad(loss)(w))
    old = config.pallas_max_wires()
    try:
        config.set_pallas_max_wires(4)
        g_wide = np.asarray(jax.grad(loss)(w))
    finally:
        config.set_pallas_max_wires(old)
    np.testing.assert_allclose(g_wide, g_ref, atol=1e-4)


def test_closed_form_channels_match_generic_kraus():
    """density.apply_channel_all_wires (Hadamard-mask / block closed forms)
    must equal the generic per-wire Kraus einsum for every reference
    channel kind and assorted strengths."""
    wires, batch = 4, 3
    d = 2**wires
    st = RNG.normal(size=(batch, d)) + 1j * RNG.normal(size=(batch, d))
    st = st / np.linalg.norm(st, axis=1, keepdims=True)
    rho = dmod.from_statevector(jnp.asarray(st, jnp.complex64))
    for kind in ("phase_damping", "amplitude_damping", "depolarizing"):
        for strength in (0.03, 0.3, 0.9):
            kraus = jnp.asarray(np.stack(ch.kraus_for(kind, strength)),
                                jnp.complex64)
            want = np.asarray(dmod.apply_kraus_all_wires(rho, kraus))
            got = np.asarray(dmod.apply_channel_all_wires(rho, kind,
                                                          strength))
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"{kind}@{strength}")
            # trace preserved
            tr = np.trace(got, axis1=1, axis2=2)
            np.testing.assert_allclose(tr, 1.0, atol=1e-5)


def test_grouped_channel_every_group_size():
    """The grouped superoperator route (one (4^g x 4^g) contraction per
    g-wire group — the MXU path for the per-wire noise loops) must equal
    the generic Kraus chain for every group size, including ragged
    wires-not-divisible-by-group splits."""
    wires, batch = 5, 2
    d = 2**wires
    st = RNG.normal(size=(batch, d)) + 1j * RNG.normal(size=(batch, d))
    st = st / np.linalg.norm(st, axis=1, keepdims=True)
    rho = dmod.from_statevector(jnp.asarray(st, jnp.complex64))
    for kind in ("phase_damping", "amplitude_damping", "depolarizing"):
        kraus = jnp.asarray(np.stack(ch.kraus_for(kind, 0.17)),
                            jnp.complex64)
        want = np.asarray(dmod.apply_kraus_all_wires(rho, kraus))
        for group in (1, 2, 3, 4, 5):
            got = np.asarray(dmod.apply_channel_all_wires_grouped(
                rho, kraus, group=group))
            np.testing.assert_allclose(got, want, atol=2e-5,
                                       err_msg=f"{kind} group={group}")


def test_dm_unitary_modes_agree():
    """config.dm_unitary_mode: the two-sided gate-chain route must equal the
    composed-unitary matmul sandwich on every dm path (reupload with both
    encodes + placements, qnn), scalar and vmapped strength."""
    from qiddm_tpu import config as cfg

    wires, L, k, batch = 3, 2, 2, 3
    w = jnp.asarray(rand_weights(L, k, wires, 3), jnp.float32)
    x = jnp.asarray(RNG.normal(size=(batch, wires)), jnp.float32)

    def run_reupload(encode, kind, strength):
        n = sim.NoiseModel(kind, strength, "encode")
        return sim.reupload_block(x, w, encode=encode, noise=n,
                                  readout="probs")

    w_qnn = jnp.asarray(rand_weights(4, wires, 3), jnp.float32)

    def run_qnn(strength):
        n = sim.NoiseModel("amplitude_damping", strength, "end")
        return sim.qnn_circuit(x, w_qnn, noise=n, readout="expvalz")

    cases = [
        lambda: run_reupload("rz", "amplitude_damping", 0.2),
        lambda: run_reupload("ry", "depolarizing", 0.3),
        lambda: run_qnn(0.15),
        # vmapped (traced) strength — the one-program intensity-sweep path
        lambda: jax.vmap(
            lambda s: sim.reupload_block(
                x, w, noise=sim.NoiseModel("amplitude_damping", s, "encode"),
                readout="expvalz")
        )(jnp.asarray([0.0, 0.1, 0.4], jnp.float32)),
    ]
    assert cfg.dm_unitary_mode() == "gates"
    for case in cases:
        got = np.asarray(case())
        cfg.set_dm_unitary_mode("matmul")
        try:
            want = np.asarray(case())
        finally:
            cfg.set_dm_unitary_mode("gates")
        np.testing.assert_allclose(got, want, atol=2e-5)
