"""Grouped-contraction wide-circuit chains (sim/wide.py) vs the per-gate
adjoint chains (sim/adjoint.py) they replace on 11+ wires: forward and
gradient parity at CPU-testable widths, group-partition invariants, and
the engine routing guard. The two implementations share no contraction
code (per-wire einsum loop vs Kronecker-grouped matmuls), so agreement
pins both."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import config
from qiddm_tpu.sim import adjoint, wide

RNG = np.random.default_rng(7)


def _angles(*shape):
    return jnp.asarray(RNG.normal(size=shape) * 0.7, jnp.float32)


def test_group_sizes_balanced():
    assert wide.group_sizes(20) == (7, 7, 6)
    assert wide.group_sizes(16) == (6, 5, 5)   # balanced, not (7, 7, 2)
    assert wide.group_sizes(14) == (7, 7)
    assert wide.group_sizes(7) == (7,)
    assert wide.group_sizes(3) == (3,)
    assert wide.group_sizes(1) == (1,)
    for w in range(1, 25):
        sizes = wide.group_sizes(w)
        assert sum(sizes) == w and max(sizes) <= 7
        assert max(sizes) - min(sizes) <= 1


@pytest.mark.parametrize("encode,imprimitive", [
    ("rz", "cz"), ("rz", "cnot"), ("ry", "cz"),
])
def test_reupload_wide_matches_adjoint(encode, imprimitive):
    """Forward + all gradients (x_enc, weights) agree with the per-gate
    adjoint chain at a width where groups split (w=9 -> (5, 4))."""
    L, k, w, b = 3, 2, 9, 4
    x = _angles(b, w)
    wq = _angles(L, k, w, 3) * 0.6

    def run(fn):
        def loss(x, wq):
            st = fn(x, wq, encode=encode, imprimitive=imprimitive)
            p = jnp.real(st) ** 2 + jnp.imag(st) ** 2
            return jnp.sum(p * jnp.linspace(0.0, 1.0, 2**w)), p

        (val, p), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(x, wq)
        return val, p, grads

    v_w, p_w, (gx_w, gw_w) = run(wide.reupload_chain_wide)
    v_a, p_a, (gx_a, gw_a) = run(adjoint.reupload_chain_adjoint)

    np.testing.assert_allclose(np.asarray(p_w), np.asarray(p_a), atol=1e-5)
    np.testing.assert_allclose(float(v_w), float(v_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_a),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_a),
                               atol=2e-5)


def test_reupload_wide_matches_plain_autodiff():
    """Independent oracle: the custom-VJP backward vs JAX autodiff
    through the engine's plain gate-level scan (no adjoint anywhere)."""
    from qiddm_tpu.sim.sel import sel_apply_gates
    from qiddm_tpu.sim.statevector import rz_phases, zero_state

    L, k, w, b = 2, 2, 8, 3
    x = _angles(b, w)
    wq = _angles(L, k, w, 3) * 0.5

    def loss_wide(x, wq):
        st = wide.reupload_chain_wide(x, wq, encode="rz", imprimitive="cz")
        return jnp.sum(jnp.abs(st) ** 2 * jnp.linspace(0.0, 1.0, 2**w))

    def loss_plain(x, wq):
        st = zero_state(b, w)
        ph = rz_phases(x, w)
        for l in range(L):
            st = st * ph
            st = sel_apply_gates(st, wq[l], imprimitive="cz")
        return jnp.sum(jnp.abs(st) ** 2 * jnp.linspace(0.0, 1.0, 2**w))

    gx_w, gw_w = jax.grad(loss_wide, argnums=(0, 1))(x, wq)
    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, wq)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_p),
                               atol=2e-5)


@pytest.mark.parametrize("imprimitive", ["cz", "cnot"])
def test_sel_chain_wide_matches_adjoint(imprimitive):
    """Deep-template SEL chain (full-cycle ranges): forward + gradients
    to BOTH the initial state and the weights."""
    depth, w, b = 5, 9, 3
    wq = _angles(depth, w, 3) * 0.6
    st = RNG.normal(size=(b, 2**w)) + 1j * RNG.normal(size=(b, 2**w))
    st = jnp.asarray(st / np.linalg.norm(st, axis=1, keepdims=True),
                     jnp.complex64)

    def loss(fn, st, wq):
        out = fn(st, wq, imprimitive=imprimitive)
        return jnp.sum(jnp.abs(out) ** 2 * jnp.linspace(0.0, 1.0, 2**w))

    v_w, (gs_w, gw_w) = jax.value_and_grad(
        lambda s, q: loss(wide.sel_chain_wide, s, q),
        argnums=(0, 1))(st, wq)
    v_a, (gs_a, gw_a) = jax.value_and_grad(
        lambda s, q: loss(adjoint.sel_chain_adjoint, s, q),
        argnums=(0, 1))(st, wq)

    np.testing.assert_allclose(float(v_w), float(v_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs_w), np.asarray(gs_a),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_a),
                               atol=2e-5)


def test_wide_single_group_width():
    """w <= 7 collapses to one group — still exact (used only by tests
    and the "on" override, but the degenerate path must hold)."""
    L, k, w, b = 2, 1, 4, 2
    x = _angles(b, w)
    wq = _angles(L, k, w, 3) * 0.5
    got = wide.reupload_chain_wide(x, wq, encode="rz", imprimitive="cz")
    want = adjoint.reupload_chain_adjoint(x, wq, encode="rz",
                                          imprimitive="cz")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_wide_x64_parity_mode():
    """complex128 chain works and matches the adjoint path at tight
    tolerance (x64 parity mode)."""
    config.enable_x64(True)
    try:
        L, k, w, b = 2, 2, 8, 2
        x = jnp.asarray(RNG.normal(size=(b, w)), jnp.float64)
        wq = jnp.asarray(RNG.normal(size=(L, k, w, 3)) * 0.5, jnp.float64)
        got = wide.reupload_chain_wide(x, wq, encode="rz",
                                       imprimitive="cz",
                                       cdtype=jnp.complex128)
        want = adjoint.reupload_chain_adjoint(x, wq, encode="rz",
                                              imprimitive="cz",
                                              cdtype=jnp.complex128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)
    finally:
        config.enable_x64(False)


def test_use_wide_threshold():
    """Auto routing boundary (measured on-chip, config.py::wide_min_wires,
    results/narrow_route_ab*.json): on TPU the grouped chain takes over
    from wide_min_wires (9) — BELOW the Pallas cap (10) — and everywhere
    beyond the cap; off-TPU auto never engages (wide "on" covers CPU)."""
    from qiddm_tpu.sim.engine import _use_wide

    lo, cap = config.wide_min_wires(), config.pallas_max_wires()
    assert lo <= cap + 1  # no routing gap: wide picks up where pallas ends
    assert not _use_wide(lo - 1, True)
    assert _use_wide(lo, True)
    assert _use_wide(cap + 1, True)
    assert not _use_wide(cap + 1, False)   # off-TPU auto -> adjoint path
    config.set_wide_mode("off")
    try:
        assert not _use_wide(lo, True)
    finally:
        config.set_wide_mode("auto")
    config.set_adjoint_mode("off")         # forward-autodiff escape hatch
    try:
        assert not _use_wide(lo, True)
    finally:
        config.set_adjoint_mode("auto")


def test_engine_wide_mode_on_matches_default():
    """config.set_wide_mode("on") forces the grouped chain through the
    ENGINE (qdense + reupload entry points); outputs and gradients match
    the default CPU routes."""
    from qiddm_tpu import sim

    x = jnp.asarray(RNG.uniform(size=(5, 64)), jnp.float32)
    wq = _angles(4, 6, 3) * 0.5
    xr = _angles(3, 8)
    wr = _angles(2, 2, 8, 3) * 0.5

    def run():
        p = sim.qdense_circuit(x, wq, wires=6)
        g = jax.grad(lambda q: jnp.sum(
            sim.reupload_block(xr, q, readout="expvalz")))(wr)
        return np.asarray(p), np.asarray(g)

    p0, g0 = run()
    config.set_wide_mode("on")
    try:
        p1, g1 = run()
    finally:
        config.set_wide_mode("auto")
    np.testing.assert_allclose(p1, p0, atol=2e-5)
    np.testing.assert_allclose(g1, g0, atol=2e-5)


def test_wide_under_vmap():
    """Pure-XLA path: safe under an outer vmap (unlike the Pallas kernel
    routes) — label-vmapped wide training must not need a guard."""
    L, k, w, b, n = 2, 1, 8, 2, 3
    xs = _angles(n, b, w)
    wqs = _angles(n, L, k, w, 3) * 0.5

    got = jax.vmap(lambda x, q: wide.reupload_chain_wide(
        x, q, encode="rz", imprimitive="cz"))(xs, wqs)
    want = jnp.stack([
        adjoint.reupload_chain_adjoint(xs[i], wqs[i], encode="rz",
                                       imprimitive="cz")
        for i in range(n)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
