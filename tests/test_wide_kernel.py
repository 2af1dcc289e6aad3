"""VMEM-resident fused wide-chain kernel (sim/pallas_wide_kernel.py) vs
the XLA grouped chain (sim/wide.py) it accelerates: forward + gradient
parity in interpret mode (packed widths and the unpacked w=20 case),
the pre-permuted/tiled ring-sign rows, batch packing with padded tail
samples, and routing guards. The two implementations share no
state-contraction code (XLA einsum over HBM vs in-VMEM transpose-cycle
matmuls on packed superstates), so agreement pins both."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import config
from qiddm_tpu.sim import wide
from qiddm_tpu.sim.pallas_wide_kernel import (MIN_WIRES, SIZES, TOTAL_BITS,
                                              ring_sign_rows)
from qiddm_tpu.sim.sel import cz_ring_signs, sel_ranges

RNG = np.random.default_rng(11)


def _angles(*shape):
    return jnp.asarray(RNG.normal(size=shape) * 0.7, jnp.float32)


@pytest.fixture(params=["scan", "monolith"])
def kernel_mode(request):
    """Force the fused-kernel route (interpret mode off-TPU) for each
    kernel variant, restoring the config afterwards (route guards are
    order-independent)."""
    prev_k, prev_w = config.wide_kernel_mode(), config.wide_mode()
    prev_v = config.wide_kernel_variant()
    config.set_wide_kernel_mode("on")
    config.set_wide_mode("on")
    config.set_wide_kernel_variant(request.param)
    yield request.param
    config.set_wide_kernel_mode(prev_k)
    config.set_wide_mode(prev_w)
    config.set_wide_kernel_variant(prev_v)


def _run(x, wq):
    def loss(x, wq):
        st = wide.reupload_chain_wide(x, wq, encode="rz",
                                      imprimitive="cz")
        w = x.shape[1]
        p = jnp.real(st) ** 2 + jnp.imag(st) ** 2
        return jnp.sum(p * jnp.linspace(0.0, 1.0, 2**w)), st

    (val, st), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(x, wq)
    return val, st, grads


@pytest.mark.parametrize("w,L,k,b", [
    (13, 2, 1, 3),    # 128 samples/superstate, 125 padded tail samples
    (15, 1, 2, 2),    # two ring ranges (distinct sign rows), pack=32
    (20, 1, 1, 2),    # unpacked: one sample per superstate, 2 grid steps
])
def test_kernel_matches_xla_chain(kernel_mode, w, L, k, b):
    """Values, final states, and gradients (x_enc + weights) agree with
    the XLA grouped chain, packed and unpacked."""
    x = _angles(b, w)
    wq = _angles(L, k, w, 3) * 0.6
    assert wide._use_wide_kernel(w, "rz", "cz", jnp.complex64)
    v_k, st_k, (gx_k, gw_k) = _run(x, wq)
    config.set_wide_kernel_mode("off")
    assert not wide._use_wide_kernel(w, "rz", "cz", jnp.complex64)
    v_x, st_x, (gx_x, gw_x) = _run(x, wq)
    np.testing.assert_allclose(np.asarray(st_k), np.asarray(st_x),
                               atol=1e-5)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_x),
                               atol=2e-5)


def test_kernel_under_jit(kernel_mode):
    """The fused route composes with jit (engine paths always jit)."""
    w, L, k, b = 13, 1, 1, 2
    x = _angles(b, w)
    wq = _angles(L, k, w, 3) * 0.5

    @jax.jit
    def f(x, wq):
        st = wide.reupload_chain_wide(x, wq, encode="rz",
                                      imprimitive="cz")
        return jnp.sum(jnp.abs(st) ** 2 * jnp.linspace(0.0, 1.0, 2**w))

    g = jax.grad(f, argnums=1)(x, wq)
    config.set_wide_kernel_mode("off")
    g_ref = jax.grad(f.__wrapped__, argnums=1)(x, wq)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-5)


def test_ring_sign_rows_tiled_permutation():
    """Pre-permuted rows are the basis-order CZ sign diagonals of the
    real ring, tiled over the superstate's batch bits, then moved to the
    (g2, g0, g1) (last-group-leading) layout."""
    w, k = 15, 2
    dims = tuple(2**s for s in SIZES)
    rows = ring_sign_rows(k, w)
    assert rows.shape == (k, dims[-1], 2**TOTAL_BITS // dims[-1])
    for li, r in enumerate(sel_ranges(k, w)):
        base = np.tile(cz_ring_signs(w, r), 2 ** (TOTAL_BITS - w))
        expect = np.transpose(base.reshape(dims),
                              (2, 0, 1)).reshape(dims[-1], -1)
        np.testing.assert_array_equal(rows[li], expect)


def test_packing_tail_is_exact(kernel_mode):
    """A batch that does NOT fill the last superstate (padded tail
    samples) returns the same states/grads as the same samples run as a
    full pack — the tail carries zero cotangents."""
    w, L, k = 13, 1, 1
    x = _angles(5, w)  # pack=128 -> 123 padded tail samples
    wq = _angles(L, k, w, 3) * 0.5
    _, st5, (gx5, gw5) = _run(x, wq)
    _, st3, (gx3, gw3) = _run(x[:3], wq)
    np.testing.assert_allclose(np.asarray(st5[:3]), np.asarray(st3),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx5[:3]), np.asarray(gx3),
                               atol=1e-6)


def test_routing_guards():
    """Eligibility: rz+cz+complex64 in [MIN_WIRES, TOTAL_BITS] only;
    "auto" needs TPU; "off" wins everywhere."""
    prev = config.wide_kernel_mode()
    try:
        config.set_wide_kernel_mode("on")
        assert wide._use_wide_kernel(MIN_WIRES, "rz", "cz", jnp.complex64)
        assert wide._use_wide_kernel(TOTAL_BITS, "rz_halfpi", "cz",
                                     jnp.complex64)
        assert not wide._use_wide_kernel(12, "rz", "cz", jnp.complex64)
        assert not wide._use_wide_kernel(21, "rz", "cz", jnp.complex64)
        assert not wide._use_wide_kernel(14, "ry", "cz", jnp.complex64)
        assert not wide._use_wide_kernel(14, "rz", "cnot", jnp.complex64)
        assert not wide._use_wide_kernel(14, "rz", "cz", jnp.complex128)
        config.set_wide_kernel_mode("auto")
        on_tpu = jax.default_backend() == "tpu"
        assert wide._use_wide_kernel(14, "rz", "cz",
                                     jnp.complex64) == on_tpu
        config.set_wide_kernel_mode("off")
        assert not wide._use_wide_kernel(14, "rz", "cz", jnp.complex64)
    finally:
        config.set_wide_kernel_mode(prev)


def test_monolith_depth_guard(monkeypatch):
    """Selecting the monolith variant at L>1 on TPU fails fast with a
    message citing the bisect measurement instead of walking into a
    multi-minute-to-OOM Mosaic compile (results/wide_kernel_bisect.json).
    Interpret mode (non-TPU backends) stays exact at any depth — covered
    by the parity tests above."""
    wide._make_wide_chain_pallas.cache_clear()
    prev_k, prev_v = config.wide_kernel_mode(), config.wide_kernel_variant()
    config.set_wide_kernel_mode("on")
    config.set_wide_kernel_variant("monolith")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        x = _angles(2, 14)
        wq = _angles(14, 2, 14, 3)
        with pytest.raises(ValueError, match="monolith.*infeasible"):
            wide.reupload_chain_wide(x, wq, encode="rz", imprimitive="cz")
    finally:
        config.set_wide_kernel_mode(prev_k)
        config.set_wide_kernel_variant(prev_v)
        wide._make_wide_chain_pallas.cache_clear()
