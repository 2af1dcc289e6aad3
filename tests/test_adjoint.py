"""Adjoint-mode differentiation (sim/adjoint.py): exact parity with plain
autodiff through the gate-level chains it replaces — forward values AND
gradients, for both chain shapes (SEL-on-a-state, re-uploading block),
both rings, both encodes, plus the engine routing knob."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import config, sim
from qiddm_tpu.sim.adjoint import reupload_chain_adjoint, sel_chain_adjoint
from qiddm_tpu.sim.sel import sel_apply_gates
from qiddm_tpu.sim.statevector import apply_ry_all, rz_phases, zero_state

RNG = np.random.default_rng(202)


def _rand_states(B, w):
    st = RNG.normal(size=(B, 2**w)) + 1j * RNG.normal(size=(B, 2**w))
    st /= np.linalg.norm(st, axis=1, keepdims=True)
    return jnp.asarray(st, jnp.complex64)


# ---------------------------------------------------------------------------
# sel_chain_adjoint vs sel_apply_gates
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("imprimitive", ["cnot", "cz"])
@pytest.mark.parametrize("w,depth", [(4, 7), (3, 2), (1, 3)])
def test_sel_chain_forward_parity(imprimitive, w, depth):
    # depth=7 at w=4 wraps the range cycle (3 ring variants over 7 layers)
    wq = jnp.asarray(RNG.normal(size=(depth, w, 3)) * 0.4, jnp.float32)
    st = _rand_states(5, w)
    want = np.asarray(sel_apply_gates(st, wq, imprimitive=imprimitive))
    got = np.asarray(sel_chain_adjoint(st, wq, imprimitive=imprimitive))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("imprimitive", ["cnot", "cz"])
def test_sel_chain_gradient_parity(imprimitive):
    B, w, depth = 5, 4, 7
    wq = jnp.asarray(RNG.normal(size=(depth, w, 3)) * 0.4, jnp.float32)
    st = _rand_states(B, w)
    coeff = jnp.asarray(RNG.normal(size=(B, 2**w)), jnp.float32)

    def loss(fn, wq, st):
        out = fn(st, wq, imprimitive=imprimitive)
        return jnp.sum(coeff * (jnp.real(out) ** 2 + jnp.imag(out) ** 2))

    g_ref = jax.grad(lambda a, b: loss(sel_apply_gates, a, b),
                     argnums=(0, 1))(wq, st)
    g_adj = jax.grad(lambda a, b: loss(sel_chain_adjoint, a, b),
                     argnums=(0, 1))(wq, st)
    np.testing.assert_allclose(np.asarray(g_adj[0]), np.asarray(g_ref[0]),
                               atol=2e-5)
    # complex cotangent into the initial state
    np.testing.assert_allclose(np.asarray(g_adj[1]), np.asarray(g_ref[1]),
                               atol=2e-5)


# ---------------------------------------------------------------------------
# reupload_chain_adjoint vs the plain-autodiff re-uploading chain
# ---------------------------------------------------------------------------

def _ref_reupload_states(x_enc, wq, encode, imprimitive):
    """The engine's wide gate-level loop, written plainly (autodiff
    residuals and all): L x [encode -> SEL(k)] on |0..0>."""
    L, k, w, _ = wq.shape
    states = zero_state(x_enc.shape[0], w, dtype=jnp.complex64)
    phases = rz_phases(x_enc, w) if encode == "rz" else None
    for l in range(L):
        if encode == "rz":
            states = states * phases
        else:
            states = apply_ry_all(states, x_enc)
        states = sel_apply_gates(states, wq[l], imprimitive=imprimitive)
    return states


@pytest.mark.parametrize("encode", ["rz", "ry"])
@pytest.mark.parametrize("imprimitive", ["cz", "cnot"])
def test_reupload_chain_parity(encode, imprimitive):
    B, w, L, k = 6, 4, 3, 2
    wq = jnp.asarray(RNG.normal(size=(L, k, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(RNG.normal(size=(B, w)), jnp.float32)
    coeff = jnp.asarray(RNG.normal(size=(B, 2**w)), jnp.float32)

    def loss(fn, wq, xe):
        out = fn(xe, wq)
        return jnp.sum(coeff * (jnp.real(out) ** 2 + jnp.imag(out) ** 2))

    ref = lambda xe, wq: _ref_reupload_states(xe, wq, encode, imprimitive)
    adj = lambda xe, wq: reupload_chain_adjoint(
        xe, wq, encode=encode, imprimitive=imprimitive)

    np.testing.assert_allclose(np.asarray(adj(xe, wq)),
                               np.asarray(ref(xe, wq)), atol=1e-6)
    g_ref = jax.grad(lambda a, b: loss(ref, a, b), argnums=(0, 1))(wq, xe)
    g_adj = jax.grad(lambda a, b: loss(adj, a, b), argnums=(0, 1))(wq, xe)
    np.testing.assert_allclose(np.asarray(g_adj[0]), np.asarray(g_ref[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_adj[1]), np.asarray(g_ref[1]),
                               atol=2e-5)


def test_reupload_chain_under_outer_vmap():
    """Label-stacked training vmaps the whole circuit: the custom VJP must
    batch correctly for values and grads."""
    B, w, L, k, S = 4, 3, 2, 2, 3
    wq = jnp.asarray(RNG.normal(size=(S, L, k, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(RNG.normal(size=(S, B, w)), jnp.float32)
    coeff = jnp.asarray(RNG.normal(size=(B, 2**w)), jnp.float32)

    def one_loss(fn, wq, xe):
        out = fn(xe, wq)
        return jnp.sum(coeff * (jnp.real(out) ** 2 + jnp.imag(out) ** 2))

    ref = lambda xe, wq: _ref_reupload_states(xe, wq, "rz", "cz")
    adj = lambda xe, wq: reupload_chain_adjoint(xe, wq)

    def total(fn, wq, xe):
        return jnp.sum(jax.vmap(lambda a, b: one_loss(fn, a, b))(wq, xe))

    np.testing.assert_allclose(
        float(total(adj, wq, xe)), float(total(ref, wq, xe)), atol=1e-5)
    g_ref = jax.grad(lambda a: total(ref, a, xe))(wq)
    g_adj = jax.grad(lambda a: total(adj, a, xe))(wq)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ref),
                               atol=3e-5)


def test_x64_parity():
    config.enable_x64(True)
    try:
        B, w, L, k = 4, 3, 2, 2
        wq = jnp.asarray(RNG.normal(size=(L, k, w, 3)) * 0.4, jnp.float64)
        xe = jnp.asarray(RNG.normal(size=(B, w)), jnp.float64)
        ref = _ref_reupload_states(xe, wq, "rz", "cz")
        got = reupload_chain_adjoint(xe, wq, cdtype=jnp.complex128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-12)
    finally:
        config.enable_x64(False)


# ---------------------------------------------------------------------------
# engine routing
# ---------------------------------------------------------------------------

def test_engine_adjoint_mode_on_matches_off(monkeypatch):
    """set_adjoint_mode('on') routes qdense + reupload through the adjoint
    chains EVEN at narrow widths (asserted via spies, so this can't
    silently become a vacuous same-path comparison); outputs and grads
    must match plain autodiff exactly."""
    import qiddm_tpu.sim.adjoint as adjoint_mod

    B, w = 5, 4
    x = jnp.asarray(RNG.uniform(size=(B, 2**w)), jnp.float32)
    wq_d = jnp.asarray(RNG.normal(size=(6, w, 3)) * 0.4, jnp.float32)
    wq_r = jnp.asarray(RNG.normal(size=(3, 2, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(RNG.normal(size=(B, w)), jnp.float32)

    def qd_loss(wq):
        return jnp.sum(sim.qdense_circuit(x, wq, wires=w) ** 2)

    def ru_loss(wq):
        return jnp.sum(sim.reupload_block(xe, wq, readout="expvalz") ** 2)

    calls = {"sel": 0, "reupload": 0}
    real_sel = adjoint_mod.sel_chain_adjoint
    real_reup = adjoint_mod.reupload_chain_adjoint

    def spy_sel(*a, **kw):
        calls["sel"] += 1
        return real_sel(*a, **kw)

    def spy_reup(*a, **kw):
        calls["reupload"] += 1
        return real_reup(*a, **kw)

    monkeypatch.setattr(adjoint_mod, "sel_chain_adjoint", spy_sel)
    monkeypatch.setattr(adjoint_mod, "reupload_chain_adjoint", spy_reup)

    outs = {}
    for mode in ("off", "on"):
        config.set_adjoint_mode(mode)
        try:
            outs[mode] = (
                np.asarray(sim.qdense_circuit(x, wq_d, wires=w)),
                np.asarray(jax.grad(qd_loss)(wq_d)),
                np.asarray(sim.reupload_block(xe, wq_r, readout="expvalz")),
                np.asarray(jax.grad(ru_loss)(wq_r)),
            )
        finally:
            config.set_adjoint_mode("auto")
        if mode == "off":
            assert calls == {"sel": 0, "reupload": 0}, calls
    assert calls["sel"] > 0 and calls["reupload"] > 0, calls
    for a, b in zip(outs["off"], outs["on"]):
        np.testing.assert_allclose(b, a, atol=2e-5)


def test_auto_mode_targets_wide_regime(monkeypatch):
    """In "auto", the adjoint route engages exactly on the gate-level wide
    regime: past the Pallas width cap on TPU, from the off-TPU wide
    threshold (wires >= 9) elsewhere."""
    from qiddm_tpu.sim.engine import _use_adjoint

    assert config.adjoint_mode() == "auto"
    assert not _use_adjoint(config.pallas_max_wires(), True)
    assert _use_adjoint(config.pallas_max_wires() + 1, True)
    assert _use_adjoint(9, False)
    assert not _use_adjoint(8, False)
    config.set_adjoint_mode("off")
    try:
        assert not _use_adjoint(config.pallas_max_wires() + 1, True)
    finally:
        config.set_adjoint_mode("auto")


def test_wide_reupload_takes_adjoint_route(monkeypatch):
    """The CPU wide path (wires >= 9 off-TPU) actually calls the adjoint
    chain in auto mode — and the result matches adjoint-off."""
    import qiddm_tpu.sim.adjoint as adjoint_mod

    B, w, L, k = 2, 9, 2, 2
    wq = jnp.asarray(RNG.normal(size=(L, k, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(RNG.normal(size=(B, w)), jnp.float32)

    calls = []
    real = adjoint_mod.reupload_chain_adjoint

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(adjoint_mod, "reupload_chain_adjoint", spy)
    got = np.asarray(sim.reupload_block(xe, wq, readout="expvalz"))
    assert calls, "auto mode did not route the wide reupload to adjoint"
    config.set_adjoint_mode("off")
    try:
        want = np.asarray(sim.reupload_block(xe, wq, readout="expvalz"))
    finally:
        config.set_adjoint_mode("auto")
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_wide_path_memory_analysis():
    """The whole point of adjoint mode: XLA's own compiled-program memory
    analysis shows the autodiff residuals gone. At (L=4, k=2, w=12) the
    plain backward saves L*k*w intermediate (B, 2**w) states; the adjoint
    backward keeps O(1)."""
    B, w, L, k = 4, 12, 4, 2
    wq = jnp.asarray(RNG.normal(size=(L, k, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(RNG.normal(size=(B, w)), jnp.float32)

    def loss(wq, xe):
        return jnp.sum(sim.reupload_block(xe, wq, readout="expvalz") ** 2)

    temps = {}
    for mode in ("off", "on"):
        config.set_adjoint_mode(mode)
        try:
            step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
            mem = step.lower(wq, xe).compile().memory_analysis()
            temps[mode] = mem.temp_size_in_bytes
        finally:
            config.set_adjoint_mode("auto")
    assert temps["off"] > 5 * temps["on"], temps
