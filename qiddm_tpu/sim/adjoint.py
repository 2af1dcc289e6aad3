"""Adjoint-mode differentiation for gate chains: O(1)-residual backward.

This is the TPU-wide-circuit analogue of PennyLane-Lightning's
``diff_method="adjoint"`` (the C++ differentiator the reference selects at
nn/qdense.py:237 etc., reimplemented natively in native/qsim.cpp): instead
of letting autodiff store every intermediate statevector of the chain
(O(L*k*wires) states of (batch, 2**w) — ~2.6 GB at a 16-wire differN
config, impossible past ~18 wires), the backward RECONSTRUCTS states by
walking the chain in reverse through inverse gates. Unitarity makes the
recomputation exact and free of residuals: only the final state, the gate
matrices, and the encoding are saved.

The same trick already powers the fused Pallas kernels' backward below the
Mosaic width cap (pallas_gate_kernel.py); this module is the pure-XLA
version for everything above it — the single-chip wide regime
(wires > config.pallas_max_wires(); engine routing via
config.adjoint_mode()) — as a drop-in for ``sel.sel_apply_gates`` and the
engine's wide re-uploading loop.

Cotangent conventions (match JAX's, verified against autodiff in
tests/test_adjoint.py): JAX transposes complex-linear ops WITHOUT
conjugation, so the cotangent pushes through a gate as ``c <- U^T c`` and a
gate's own cotangent is ``dU[x, y] = sum_b c_out[b, x] * s_in[b, y]`` (no
conjugate on either side) — while state RECONSTRUCTION uses the true
inverse ``U^H``. CZ rings are real diagonals (undo == transpose ==
multiply); a CNOT ring is a basis permutation whose undo and transpose are
both the inverse-permutation gather.

Covers the two chain shapes the engine needs:

* ``sel_chain_adjoint(states, weights)`` — one SEL block on an arbitrary
  initial state (Qdense amplitude embeds, QNN product states), scanned
  over depth with full-depth range cycling exactly like
  ``sel.sel_apply_gates``; cotangent flows into the initial state;
* ``reupload_chain_adjoint(...)`` — the full L x [encode -> SEL(k)] block
  with RZ-diagonal or per-sample-RY re-uploading (QIDDM / differN /
  QIDDM_PL_noise1 families), cotangents flow to the encoding and weights.

Both scan over the layer axis with the per-layer ring rows riding the scan
as inputs, so program size is O(k * wires) — constant in depth/L, matching
the forward-only paths they replace. The ring rows are static per
(L, k, wires, imprimitive) and live in the closure of a cached custom-VJP
factory (``_make_chain``) — they are never differentiated, and CNOT
permutations stay exact int32 at any width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as _config
from .gates import rot_matrix
from .sel import cnot_ring_perm, cz_ring_signs, sel_ranges
from .statevector import apply_1q


def _ring_tables(L: int, k: int, wires: int, imprimitive: str,
                 full_cycle: bool):
    """Static ring data, DEDUPLICATED to the ``wires - 1`` distinct ranges.

    Returns ``(kind, tab, idx)``: ``tab`` is (p, 2, d) with ``tab[i, 0]``
    realizing the ring of range ``i + 1`` forward and ``tab[i, 1]`` undoing
    it (CZ: float64 sign rows, self-inverse so both slots equal; CNOT:
    int32 row-gathers — the undo slot is the inverse permutation, which
    also transposes the cotangent); ``idx`` is the (L, k) int32 table
    index per sublayer. Storing only distinct rows matters at width: the
    naive (L, k, 2, d) layout is ~235 MB of redundant constants at
    (L=14, k=2, w=20). ``full_cycle`` makes the range cycle across the
    whole L*k chain (one deep SEL template, sel_apply_gates semantics);
    otherwise it restarts every spectrum layer (the reference instantiates
    a fresh SEL template per re-uploading layer, nn/qdense.py:1302-1305) —
    every layer then shares one static row set.
    """
    if wires == 1:
        return ("none", None, None)
    if full_cycle:
        ranges = np.asarray(sel_ranges(L * k, wires)).reshape(L, k)
    else:
        ranges = np.tile(np.asarray(sel_ranges(k, wires)), (L, 1))
    idx = (ranges - 1).astype(np.int32)
    p = wires - 1
    if imprimitive == "cz":
        rows = np.stack([cz_ring_signs(wires, r + 1) for r in range(p)])
        tab = np.stack([rows, rows], axis=1)  # (p, 2, d)
        return ("cz", tab, idx)
    if imprimitive == "cnot":
        fwd = np.stack([cnot_ring_perm(wires, r + 1) for r in range(p)])
        bwd = np.argsort(fwd, axis=-1)
        tab = np.stack([fwd, bwd], axis=1).astype(np.int32)
        return ("cnot", tab, idx)
    raise ValueError(f"unknown imprimitive {imprimitive!r}")


def _apply_ring(states, row, kind: str):
    """Apply one ring row (a slot of the dedup table): CZ sign multiply or
    CNOT permutation gather. The same op serves forward (slot 0), state
    undo (slot 1), and cotangent transpose (slot 1) — CZ diagonals are
    real self-inverse, and a permutation's transpose equals its inverse
    permutation."""
    if kind == "cz":
        return states * row.astype(states.dtype)[None, :]
    return jnp.take(states, row, axis=1)


def _pair_dg(ct, s_in, wire: int, wires: int):
    """Gate cotangent dU[x, y] = sum_{b, pairs} ct[..x..] * s_in[..y..]
    (JAX's unconjugated convention), shared (2, 2) gate."""
    b = ct.shape[0]
    left = 2**wire
    right = 2 ** (wires - wire - 1)
    c = ct.reshape(b, left, 2, right)
    s = s_in.reshape(b, left, 2, right)
    return jnp.einsum("blxr,blyr->xy", c, s,
                      precision=_config.matmul_precision())


def _pair_dg_batched(ct, s_in, wire: int, wires: int):
    """Per-sample gate cotangent (B, 2, 2) for batched 1q gates."""
    b = ct.shape[0]
    left = 2**wire
    right = 2 ** (wires - wire - 1)
    c = ct.reshape(b, left, 2, right)
    s = s_in.reshape(b, left, 2, right)
    return jnp.einsum("blxr,blyr->bxy", c, s,
                      precision=_config.matmul_precision())


def _adj(g):
    """True inverse of a unitary gate (conjugate transpose), any batching."""
    return jnp.conj(jnp.swapaxes(g, -1, -2))


def _enc_fwd(states, enc, encode_kind: str, wires: int):
    if encode_kind == "none":
        return states
    if encode_kind == "rz":
        return states * enc
    # "ry": enc is (B, wires, 2, 2) per-sample gates
    for j in range(wires):
        states = apply_1q(states, enc[:, j], j, wires)
    return states


def _enc_bwd(s, c, d_enc, enc, encode_kind: str, wires: int):
    """Reverse through the encoding: reconstruct the pre-encode state,
    accumulate the encoding's cotangent, transpose the chain cotangent."""
    if encode_kind == "none":
        return s, c, d_enc
    if encode_kind == "rz":
        s_in = s * jnp.conj(enc)  # unit phases: conj == inverse
        d_enc = d_enc + c * s_in
        return s_in, c * enc, d_enc
    for j in range(wires - 1, -1, -1):
        g = enc[:, j]
        s = apply_1q(s, _adj(g), j, wires)
        d_enc = d_enc.at[:, j].add(_pair_dg_batched(c, s, j, wires))
        c = apply_1q(c, jnp.swapaxes(g, -1, -2), j, wires)
    return s, c, d_enc


@functools.lru_cache(maxsize=None)
def _make_chain(L: int, k: int, wires: int, imprimitive: str,
                encode_kind: str, full_cycle: bool):
    """Build the custom-VJP chain program for one static configuration.

    The returned function maps ``(states0, enc, mats) -> states`` where
    states0: (B, 2**w); enc: (B, 2**w) RZ phases | (B, w, 2, 2) RY gates |
    a 0-size placeholder for "none"; mats: (L, k, w, 2, 2). Ring rows are
    closure constants (never differentiated); caching keeps one function
    object per configuration so jit caches compiled programs across calls.
    """
    ring_kind, tab_np, idx_np = _ring_tables(L, k, wires, imprimitive,
                                             full_cycle)
    # per-layer-restarting rings (reupload) share one static row set; only
    # the full-cycle chain needs the range index to ride the scan
    uniform = not full_cycle

    def _row(tab, idx_l, li: int, slot: int):
        if uniform:
            return tab[int(idx_np[0, li]), slot]
        return jnp.take(tab, idx_l[li], axis=0)[slot]

    def fwd_impl(states0, enc, mats):
        tab = None if ring_kind == "none" else jnp.asarray(tab_np)
        idx_xs = (None if (ring_kind == "none" or uniform)
                  else jnp.asarray(idx_np))

        def body(s, xs):
            mats_l, idx_l = xs  # (k, w, 2, 2), (k,) | None
            s = _enc_fwd(s, enc, encode_kind, wires)
            for li in range(k):
                for j in range(wires):
                    s = apply_1q(s, mats_l[li, j], j, wires)
                if ring_kind != "none":
                    s = _apply_ring(s, _row(tab, idx_l, li, 0), ring_kind)
            return s, None

        s, _ = jax.lax.scan(body, states0, (mats, idx_xs))
        return s

    @jax.custom_vjp
    def chain(states0, enc, mats):
        return fwd_impl(states0, enc, mats)

    def chain_fwd(states0, enc, mats):
        out = fwd_impl(states0, enc, mats)
        return out, (out, enc, mats)

    def chain_bwd(res, ct):
        out, enc, mats = res
        d_enc0 = jnp.zeros_like(enc)
        tab = None if ring_kind == "none" else jnp.asarray(tab_np)
        idx_xs = (None if (ring_kind == "none" or uniform)
                  else jnp.asarray(idx_np)[::-1])

        def body(carry, xs):
            mats_l, idx_l = xs
            s, c, d_enc = carry
            dm_l = jnp.zeros_like(mats_l)
            for li in range(k - 1, -1, -1):
                if ring_kind != "none":
                    row = _row(tab, idx_l, li, 1)  # undo == transpose slot
                    s = _apply_ring(s, row, ring_kind)
                    c = _apply_ring(c, row, ring_kind)
                for j in range(wires - 1, -1, -1):
                    g = mats_l[li, j]
                    s = apply_1q(s, _adj(g), j, wires)  # reconstruct input
                    dm_l = dm_l.at[li, j].set(_pair_dg(c, s, j, wires))
                    c = apply_1q(c, g.T, j, wires)  # unconjugated transpose
            s, c, d_enc = _enc_bwd(s, c, d_enc, enc, encode_kind, wires)
            return (s, c, d_enc), dm_l

        (s0, c0, d_enc), dms = jax.lax.scan(
            body, (out, ct, d_enc0), (mats[::-1], idx_xs))
        return c0, d_enc, dms[::-1]

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def sel_chain_adjoint(states, weights, imprimitive: str = "cnot"):
    """Drop-in for ``sel.sel_apply_gates`` with the adjoint backward.

    states: (B, 2**w); weights: (depth, wires, 3) rotation angles. Range
    cycle spans the full depth (one deep template), matching
    sel_apply_gates; the scan runs over depth with k=1 so program size is
    O(wires). Gradients flow to both ``states`` and ``weights``.
    """
    depth, wires, _ = weights.shape
    mats = rot_matrix(weights[..., 0], weights[..., 1],
                      weights[..., 2]).astype(states.dtype)
    chain = _make_chain(depth, 1, wires, imprimitive, "none",
                        full_cycle=True)
    enc = jnp.zeros((0,), states.dtype)  # "none" placeholder
    return chain(states, enc, mats[:, None])


def reupload_chain_adjoint(x_enc, block_weights, *, encode: str = "rz",
                           imprimitive: str = "cz", cdtype=jnp.complex64):
    """Full re-uploading block with the adjoint backward.

    x_enc: (B, wires) encoding angles (already halfpi/rot-angle adjusted by
    the engine); block_weights: (L, k, wires, 3). The ring range cycle
    restarts every spectrum layer (the reference instantiates a fresh SEL
    template per layer, nn/qdense.py:1302-1305). Returns final states
    (B, 2**w); gradients flow to x_enc and block_weights.
    """
    from .statevector import ry_gates, rz_phases, zero_state

    L, k, wires, _ = block_weights.shape
    batch = x_enc.shape[0]
    flat = block_weights.reshape(L * k, wires, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1],
                      flat[..., 2]).astype(cdtype)
    mats = mats.reshape(L, k, wires, 2, 2)
    states0 = zero_state(batch, wires, dtype=cdtype)
    if encode in ("rz", "rz_halfpi"):
        enc = rz_phases(x_enc, wires).astype(cdtype)
        kind = "rz"
    elif encode == "ry":
        enc = ry_gates(x_enc, dtype=cdtype)  # (B, wires, 2, 2)
        kind = "ry"
    else:
        raise ValueError(f"unknown encode {encode!r}")
    chain = _make_chain(L, k, wires, imprimitive, kind, full_cycle=False)
    return chain(states0, enc, mats)
