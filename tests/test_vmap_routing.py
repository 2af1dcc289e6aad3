"""Vmapped circuit programs must be correct on every route: an outer
jax.vmap (label-/trial-stacked training) routes the Qdense/QNN SEL chain to
the natively-batching XLA gate path (the pallas kernel's default batching
rule kernel-faulted the TPU worker), and results equal the unvmapped
program stacked by hand."""

import jax
import jax.numpy as jnp
import numpy as np

from qiddm_tpu.sim import engine

RNG = np.random.default_rng(9)


def test_qdense_vmap_matches_loop():
    wires, depth, B, T = 4, 5, 3, 4
    x = jnp.asarray(RNG.uniform(size=(T, B, 2**wires)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(T, depth, wires, 3)) * 0.4, jnp.float32)

    def one(xi, wi):
        return engine.qdense_circuit(xi, wi, wires=wires)

    got = np.asarray(jax.jit(jax.vmap(one))(x, w))
    want = np.stack([np.asarray(one(x[i], w[i])) for i in range(T)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_qdense_vmap_grad_matches_loop():
    wires, depth, B, T = 3, 4, 2, 3
    x = jnp.asarray(RNG.uniform(size=(T, B, 2**wires)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(T, depth, wires, 3)) * 0.4, jnp.float32)
    tgt = jnp.asarray(RNG.uniform(size=(B, 2**wires)), jnp.float32)

    def loss_one(wi, xi):
        p = engine.qdense_circuit(xi, wi, wires=wires)
        return jnp.mean((p - tgt) ** 2)

    g_v = np.asarray(jax.jit(jax.vmap(jax.grad(loss_one)))(w, x))
    g_l = np.stack([np.asarray(jax.grad(loss_one)(w[i], x[i]))
                    for i in range(T)])
    np.testing.assert_allclose(g_v, g_l, atol=1e-4)


def test_batch_traced_detector():
    seen = []

    def probe(x):
        seen.append(engine._batch_traced(x))
        return x * 2

    jax.vmap(probe)(jnp.ones((3, 2)))
    assert seen == [True]
    seen.clear()
    jax.jit(probe)(jnp.ones((3, 2)))
    assert seen == [False]
    probe(jnp.ones((3, 2)))
    assert seen == [False, False]


def test_reupload_gate_kernel_routes_off_under_vmap(monkeypatch):
    """Outer vmap must NOT take the gate-chain pallas route (default pallas
    batching rule kernel-faults the TPU worker — same failure mode the
    qdense SEL guard covers). Simulate the TPU routing conditions and spy
    on the kernels."""
    from qiddm_tpu import config as _cfg
    from qiddm_tpu.sim import pallas_gate_kernel as pgk

    wires, L, k, B, T = 4, 2, 2, 3, 2  # B < 2**wires -> kernel regime
    x = jnp.asarray(RNG.uniform(size=(T, B, wires)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(T, L, k, wires, 3)) * 0.4, jnp.float32)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(_cfg, "_USE_PALLAS", True)

    def boom(*a, **kw):
        raise AssertionError("pallas kernel must not run under outer vmap")

    monkeypatch.setattr(pgk, "gate_chain_planes", boom)
    monkeypatch.setattr(pgk, "ry_chain_planes", boom)

    def one(xi, wi):
        return engine.reupload_block(xi, wi, encode="rz", imprimitive="cz")

    got = np.asarray(jax.vmap(one)(x, w))
    assert got.shape == (T, B, 2**wires)

    # and the unvmapped call in the same conditions WOULD take the kernel
    import pytest

    with pytest.raises(AssertionError, match="must not run"):
        one(x[0], w[0])
