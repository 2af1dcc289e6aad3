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
the forward-only paths they replace.
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


def _ring_rows(L: int, k: int, wires: int, imprimitive: str,
               full_cycle: bool) -> np.ndarray:
    """Per-(layer, sublayer) ring data as a dense float array.

    Returns (L, k, 2, d) float32: [..., 0, :] realizes the ring forward,
    [..., 1, :] undoes it (CZ: signs, self-inverse so both slots equal;
    CNOT: the fwd row-gather and its inverse permutation — used both to
    undo the state and to transpose the cotangent). ``full_cycle`` makes
    the imprimitive range cycle across the whole L*k chain (one deep SEL
    template, sel_apply_gates semantics); otherwise it restarts every
    spectrum layer (the reference instantiates a fresh SEL template per
    re-uploading layer, nn/qdense.py:1302-1305). Float dtype keeps the
    custom-VJP signature all-float (zero cotangents instead of float0);
    CNOT rows are cast back to int32 at the gather.
    """
    if wires == 1:
        return np.zeros((L, k, 2, 1), dtype=np.float32)
    if full_cycle:
        ranges = np.asarray(sel_ranges(L * k, wires)).reshape(L, k)
    else:
        ranges = np.tile(np.asarray(sel_ranges(k, wires)), (L, 1))
    rows = np.empty((L, k, 2, 2**wires), dtype=np.float32)
    for l in range(L):
        for li in range(k):
            r = int(ranges[l, li])
            if imprimitive == "cz":
                s = cz_ring_signs(wires, r)
                rows[l, li, 0] = rows[l, li, 1] = s
            elif imprimitive == "cnot":
                fwd = cnot_ring_perm(wires, r)
                rows[l, li, 0] = fwd
                rows[l, li, 1] = np.argsort(fwd)
            else:
                raise ValueError(f"unknown imprimitive {imprimitive!r}")
    return rows


def _ring_fwd(states, row, kind: str):
    """Apply one ring row forward. row: (2, d) — slot 0 is the fwd form."""
    if kind == "none":
        return states
    if kind == "cz":
        return states * row[0].astype(states.dtype)[None, :]
    return jnp.take(states, row[0].astype(jnp.int32), axis=1)


def _ring_bwd(arr, row, kind: str):
    """Undo the ring on a state OR transpose it on a cotangent — the same
    array op for both (CZ diagonal is real self-inverse; permutation
    transpose == inverse permutation). Slot 1 is the undo form."""
    if kind == "none":
        return arr
    if kind == "cz":
        return arr * row[1].astype(arr.dtype)[None, :]
    return jnp.take(arr, row[1].astype(jnp.int32), axis=1)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _chain(states0, enc, mats, ring, encode_kind: str, ring_kind: str):
    """L x [encode -> k x (wire rotations -> ring)] on a state batch.

    states0: (B, 2**w); enc: (B, 2**w) RZ phases | (B, w, 2, 2) RY gates |
    a 0-size placeholder for "none"; mats: (L, k, w, 2, 2);
    ring: (L, k, 2, d) float rows from ``_ring_rows`` (zero cotangent).
    """
    return _chain_fwd_impl(states0, enc, mats, ring, encode_kind, ring_kind)


def _chain_fwd_impl(states0, enc, mats, ring, encode_kind, ring_kind):
    k, wires = mats.shape[1], mats.shape[2]

    def body(s, xs):
        mats_l, ring_l = xs  # (k, w, 2, 2), (k, 2, d)
        s = _enc_fwd(s, enc, encode_kind, wires)
        for li in range(k):
            for j in range(wires):
                s = apply_1q(s, mats_l[li, j], j, wires)
            s = _ring_fwd(s, ring_l[li], ring_kind)
        return s, None

    s, _ = jax.lax.scan(body, states0, (mats, ring))
    return s


def _chain_fwd(states0, enc, mats, ring, encode_kind, ring_kind):
    out = _chain_fwd_impl(states0, enc, mats, ring, encode_kind, ring_kind)
    return out, (out, enc, mats, ring)


def _chain_bwd(encode_kind, ring_kind, res, ct):
    out, enc, mats, ring = res
    k, wires = mats.shape[1], mats.shape[2]
    d_enc0 = jnp.zeros_like(enc)

    def body(carry, xs):
        mats_l, ring_l = xs
        s, c, d_enc = carry
        dm_l = jnp.zeros_like(mats_l)
        for li in range(k - 1, -1, -1):
            s = _ring_bwd(s, ring_l[li], ring_kind)
            c = _ring_bwd(c, ring_l[li], ring_kind)
            for j in range(wires - 1, -1, -1):
                g = mats_l[li, j]
                s = apply_1q(s, _adj(g), j, wires)  # reconstruct input state
                dm_l = dm_l.at[li, j].set(_pair_dg(c, s, j, wires))
                c = apply_1q(c, g.T, j, wires)  # unconjugated transpose
        s, c, d_enc = _enc_bwd(s, c, d_enc, enc, encode_kind, wires)
        return (s, c, d_enc), dm_l

    (s0, c0, d_enc), dms = jax.lax.scan(
        body, (out, ct, d_enc0), (mats[::-1], ring[::-1]))
    return c0, d_enc, dms[::-1], jnp.zeros_like(ring)


_chain.defvjp(_chain_fwd, _chain_bwd)


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
    ring_kind = "none" if wires == 1 else imprimitive
    ring = jnp.asarray(_ring_rows(depth, 1, wires, imprimitive,
                                  full_cycle=True))
    enc = jnp.zeros((0,), states.dtype)  # "none" placeholder
    return _chain(states, enc, mats[:, None], ring, "none", ring_kind)


def reupload_chain_adjoint(x_enc, block_weights, *, encode: str = "rz",
                           imprimitive: str = "cz", cdtype=jnp.complex64):
    """Full re-uploading block with the adjoint backward.

    x_enc: (B, wires) encoding angles (already halfpi/rot-angle adjusted by
    the engine); block_weights: (L, k, wires, 3). The ring range cycle
    restarts every spectrum layer (the reference instantiates a fresh SEL
    template per layer, nn/qdense.py:1302-1305). Returns final states
    (B, 2**w); gradients flow to x_enc and block_weights.
    """
    from .statevector import rz_phases, zero_state

    L, k, wires, _ = block_weights.shape
    batch = x_enc.shape[0]
    flat = block_weights.reshape(L * k, wires, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1],
                      flat[..., 2]).astype(cdtype)
    mats = mats.reshape(L, k, wires, 2, 2)
    ring_kind = "none" if wires == 1 else imprimitive
    ring = jnp.asarray(_ring_rows(L, k, wires, imprimitive,
                                  full_cycle=False))
    states0 = zero_state(batch, wires, dtype=cdtype)
    if encode in ("rz", "rz_halfpi"):
        enc = rz_phases(x_enc, wires).astype(cdtype)
        kind = "rz"
    elif encode == "ry":
        c = jnp.cos(x_enc / 2)
        s = jnp.sin(x_enc / 2)
        enc = jnp.stack(
            [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)],
            axis=-2).astype(cdtype)  # (B, wires, 2, 2)
        kind = "ry"
    else:
        raise ValueError(f"unknown encode {encode!r}")
    return _chain(states0, enc, mats, ring, kind, ring_kind)
