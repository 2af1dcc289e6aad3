"""Gate-level fused Pallas kernel: parity with the jnp engine path
(interpret mode on CPU; the TPU path is exercised by bench runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import sim
from qiddm_tpu.sim.gates import rot_matrix
from qiddm_tpu.sim.pallas_gate_kernel import gate_chain_pallas
from qiddm_tpu.sim.statevector import rz_phases

RNG = np.random.default_rng(61)


def _params(B=6, w=4, L=3, k=2):
    wq = jnp.asarray(RNG.normal(size=(L, k, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(RNG.normal(size=(B, w)), jnp.float32)
    return wq, xe, B, w, L, k


def test_gate_kernel_forward_matches_engine():
    wq, xe, B, w, L, k = _params()
    want = np.asarray(sim.reupload_block(xe, wq, imprimitive="cz",
                                         readout="probs"))
    flat = wq.reshape(L * k, w, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
    st = gate_chain_pallas(rz_phases(xe, w), mats, k, w, interpret=True)
    got = np.asarray(jnp.abs(st) ** 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gate_kernel_gradients_match_engine():
    wq, xe, B, w, L, k = _params()
    coeff = jnp.asarray(RNG.normal(size=(B, 2**w)), jnp.float32)

    def loss_kernel(wq, xe):
        flat = wq.reshape(L * k, w, 3)
        mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
        st = gate_chain_pallas(rz_phases(xe, w), mats, k, w, interpret=True)
        return jnp.sum(coeff * (jnp.real(st) ** 2 + jnp.imag(st) ** 2))

    def loss_engine(wq, xe):
        return jnp.sum(coeff * sim.reupload_block(xe, wq, imprimitive="cz",
                                                  readout="probs"))

    g1 = jax.grad(loss_engine, argnums=(0, 1))(wq, xe)
    g2 = jax.grad(loss_kernel, argnums=(0, 1))(wq, xe)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               atol=3e-5)


def _sel_chain_setup(B=5, w=4, depth=5):
    """Random normalized initial states + SEL weights (depth > w-1 so the
    range cycle wraps: p=3 ring variants over 5 layers)."""
    wq = jnp.asarray(RNG.normal(size=(depth, w, 3)) * 0.4, jnp.float32)
    st = RNG.normal(size=(B, 2**w)) + 1j * RNG.normal(size=(B, 2**w))
    st = st / np.linalg.norm(st, axis=1, keepdims=True)
    return wq, jnp.asarray(st, jnp.complex64)


@pytest.mark.parametrize("imprimitive", ["cnot", "cz"])
def test_sel_chain_kernel_matches_direct(imprimitive):
    from qiddm_tpu.sim.pallas_gate_kernel import sel_chain_pallas
    from qiddm_tpu.sim.sel import sel_apply_direct

    wq, st = _sel_chain_setup()
    want = np.asarray(sel_apply_direct(st, wq, imprimitive=imprimitive))
    mats = rot_matrix(wq[..., 0], wq[..., 1], wq[..., 2])
    got = np.asarray(sel_chain_pallas(st, mats, 4, imprimitive=imprimitive,
                                      interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("imprimitive", ["cnot", "cz"])
def test_sel_chain_kernel_gradients_match(imprimitive):
    from qiddm_tpu.sim.pallas_gate_kernel import sel_chain_pallas
    from qiddm_tpu.sim.sel import sel_apply_gates

    wq, st = _sel_chain_setup(B=4, w=3, depth=4)
    coeff = jnp.asarray(RNG.normal(size=(4, 2**3)), jnp.float32)
    sr, si = jnp.real(st), jnp.imag(st)

    def loss_kernel(wq, sr, si):
        mats = rot_matrix(wq[..., 0], wq[..., 1], wq[..., 2])
        out = sel_chain_pallas(sr + 1j * si, mats, 3,
                               imprimitive=imprimitive, interpret=True)
        return jnp.sum(coeff * (jnp.real(out) ** 2 + jnp.imag(out) ** 2))

    def loss_engine(wq, sr, si):
        out = sel_apply_gates((sr + 1j * si).astype(jnp.complex64), wq,
                              imprimitive=imprimitive)
        return jnp.sum(coeff * (jnp.real(out) ** 2 + jnp.imag(out) ** 2))

    g1 = jax.grad(loss_engine, argnums=(0, 1, 2))(wq, sr, si)
    g2 = jax.grad(loss_kernel, argnums=(0, 1, 2))(wq, sr, si)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_ry_chain_kernel_forward_matches_engine():
    from qiddm_tpu.sim.pallas_gate_kernel import ry_chain_pallas

    wq, xe, B, w, L, k = _params()
    want = np.asarray(sim.reupload_block(xe, wq, encode="ry",
                                         imprimitive="cz",
                                         readout="expvalz"))
    flat = wq.reshape(L * k, w, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
    st = ry_chain_pallas(xe, mats, k, w, interpret=True)
    from qiddm_tpu.sim.statevector import expval_z

    got = np.asarray(expval_z(st))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ry_chain_kernel_gradients_match_engine():
    from qiddm_tpu.sim.pallas_gate_kernel import ry_chain_pallas

    wq, xe, B, w, L, k = _params(B=5, w=3, L=3, k=2)
    coeff = jnp.asarray(RNG.normal(size=(B, 2**w)), jnp.float32)

    def loss_kernel(wq, xe):
        flat = wq.reshape(L * k, w, 3)
        mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
        st = ry_chain_pallas(xe, mats, k, w, interpret=True)
        return jnp.sum(coeff * (jnp.real(st) ** 2 + jnp.imag(st) ** 2))

    def loss_engine(wq, xe):
        return jnp.sum(coeff * sim.reupload_block(xe, wq, encode="ry",
                                                  imprimitive="cz",
                                                  readout="probs"))

    g1 = jax.grad(loss_engine, argnums=(0, 1))(wq, xe)
    g2 = jax.grad(loss_kernel, argnums=(0, 1))(wq, xe)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                               atol=3e-5)


def test_ry_chain_kernel_under_vmap():
    """Outer-vmap parity (label-stacked programs batch the kernel via
    pallas' default batching rule — pin that it stays correct)."""
    from qiddm_tpu.sim.pallas_gate_kernel import ry_chain_pallas

    wq, xe, B, w, L, k = _params(B=4, w=3, L=2, k=2)
    wq2 = jnp.stack([wq, wq * 0.5])
    xe2 = jnp.stack([xe, xe + 0.3])

    def one(wq, xe):
        flat = wq.reshape(L * k, w, 3)
        mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
        return ry_chain_pallas(xe, mats, k, w, interpret=True)

    got = jax.vmap(one)(wq2, xe2)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(one(wq2[i], xe2[i])),
                                   atol=1e-5)


def test_gate_kernel_k3():
    wq, xe, B, w, L, k = _params(w=3, L=2, k=3)
    want = np.asarray(sim.reupload_block(xe, wq, imprimitive="cz",
                                         readout="expvalz"))
    flat = wq.reshape(L * k, w, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
    st = gate_chain_pallas(rz_phases(xe, w), mats, k, w, interpret=True)
    from qiddm_tpu.sim.statevector import expval_z

    got = np.asarray(expval_z(st))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _collect_primitives(jaxpr, acc):
    # pallas_call stores its kernel body as a raw Jaxpr (no .jaxpr attr);
    # scan/cond store ClosedJaxprs — recurse into anything with .eqns.
    def _is_jaxpr_like(x):
        return hasattr(x, "eqns") or hasattr(x, "jaxpr")

    for eqn in jaxpr.eqns:
        acc.add(eqn.primitive.name)
        for v in eqn.params.values():
            for sub in jax.tree_util.tree_leaves(v, is_leaf=_is_jaxpr_like):
                if hasattr(sub, "jaxpr"):
                    sub = sub.jaxpr
                if hasattr(sub, "eqns"):
                    _collect_primitives(sub, acc)
    return acc


@pytest.mark.parametrize("entry", ["rz", "ry"])
def test_kernel_bwd_has_no_scatter(entry):
    """Mosaic has no TPU lowering for scatter/scatter-add; interpret-mode
    CPU tests can't catch one sneaking into a kernel body (a `.at[].add`
    regression shipped exactly this way — the RY backward kernel-faulted
    on real TPU while every CPU test stayed green). Walk the whole traced
    jaxpr, pallas kernel bodies included, and pin scatter out."""
    from qiddm_tpu.sim.pallas_gate_kernel import (gate_chain_planes,
                                                  ry_chain_planes)

    wq, xe, B, w, L, k = _params()
    mats = rot_matrix(wq.reshape(L * k, w, 3)[..., 0],
                      wq.reshape(L * k, w, 3)[..., 1],
                      wq.reshape(L * k, w, 3)[..., 2])

    if entry == "rz":
        ph = rz_phases(xe, w)
        pr = jnp.real(ph).astype(jnp.float32).T
        pi = jnp.imag(ph).astype(jnp.float32).T

        def loss(m):
            sr, si = gate_chain_planes(pr, pi, m, k, w, interpret=True)
            return (sr * sr + si * si).sum()
    else:

        def loss(m):
            sr, si = ry_chain_planes(xe, m, k, w, interpret=True)
            return (sr * sr + si * si).sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss))(mats)
    prims = _collect_primitives(jaxpr.jaxpr, set())
    bad = {p for p in prims if "scatter" in p}
    assert not bad, f"scatter primitives reached a pallas program: {bad}"


@pytest.mark.parametrize("B", [7, 16, 37])
def test_sel_chain_tiled_matches_direct(B):
    """The batch-tiled wrapper (trajectory-backend wide route) equals the
    single-block kernel semantics at every pad/chunk shape: B < tile
    (direct call), B == a multiple of tile, and B needing padding."""
    from qiddm_tpu.sim.pallas_gate_kernel import sel_chain_pallas_tiled
    from qiddm_tpu.sim.sel import sel_apply_direct

    wq, _ = _sel_chain_setup()
    st = RNG.normal(size=(B, 2**4)) + 1j * RNG.normal(size=(B, 2**4))
    st = jnp.asarray(st / np.linalg.norm(st, axis=1, keepdims=True),
                     jnp.complex64)
    want = np.asarray(sel_apply_direct(st, wq, imprimitive="cz"))
    mats = rot_matrix(wq[..., 0], wq[..., 1], wq[..., 2])
    got = np.asarray(sel_chain_pallas_tiled(st, mats, 4, imprimitive="cz",
                                            tile=16, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sel_chain_tiled_gradients_match():
    """Gradients flow through the lax.map chunks into the states AND the
    chunk-shared rot_mats (summed across chunks)."""
    from qiddm_tpu.sim.pallas_gate_kernel import sel_chain_pallas_tiled
    from qiddm_tpu.sim.sel import sel_apply_gates

    wq, _ = _sel_chain_setup(w=3, depth=4)
    B, tile = 11, 4
    st = RNG.normal(size=(B, 2**3)) + 1j * RNG.normal(size=(B, 2**3))
    st = st / np.linalg.norm(st, axis=1, keepdims=True)
    sr = jnp.asarray(np.real(st), jnp.float32)
    si = jnp.asarray(np.imag(st), jnp.float32)
    coeff = jnp.asarray(RNG.normal(size=(B, 2**3)), jnp.float32)

    def loss_tiled(wq, sr, si):
        mats = rot_matrix(wq[..., 0], wq[..., 1], wq[..., 2])
        out = sel_chain_pallas_tiled(sr + 1j * si, mats, 3,
                                     imprimitive="cnot", tile=tile,
                                     interpret=True)
        return jnp.sum(coeff * (jnp.real(out) ** 2 + jnp.imag(out) ** 2))

    def loss_engine(wq, sr, si):
        out = sel_apply_gates((sr + 1j * si).astype(jnp.complex64), wq,
                              imprimitive="cnot")
        return jnp.sum(coeff * (jnp.real(out) ** 2 + jnp.imag(out) ** 2))

    g1 = jax.grad(loss_engine, argnums=(0, 1, 2))(wq, sr, si)
    g2 = jax.grad(loss_tiled, argnums=(0, 1, 2))(wq, sr, si)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
