"""Fused Pallas kernel for the density-matrix re-uploading chain.

The dm test path (the *_noise drivers' "device swap" to ``default.mixed``,
reference src/mnist_noise.py:214-230) runs L x [RZ encode -> per-wire channel
-> SEL(k, CZ)] on a batch of density matrices. In XLA that is ~50 small ops
per spectrum layer on (b, d, d) tensors — at the reference noise-sweep shapes
(b=10, d=256) every op is far too small to fill the chip and the step is
pure per-op overhead (measured 14 ms per denoise step on the v5e; the
composed-unitary and gate-level XLA variants tie, results/dm_unitary_ab.json).

This kernel runs the ENTIRE block in one Pallas program, with rho held in
VMEM as (d, b*d) float32 planes (real, imag): rows = the row index of rho,
lanes = (sample, column). Per spectrum layer:

* RZ encode — one complex multiply by precomputed phase planes
  ``E[i, (s,c)] = ph[s,i] * conj(ph[s,c])``;
* channel — per-wire closed forms (density.py:98-142) expressed as
  row/lane-bit masks + xor-partner double rolls;
* SEL — per-wire 2x2 rotations applied to the ROW axis (U rho) and their
  elementwise conjugates to the LANE axis (rho U^dagger), then the CZ ring
  as row-sign x lane-sign planes.

Forward-only: the dm backend is a test-time path (training is clean;
reference src/mnist_noise.py trains with add_noise=0) — autodiff through
this kernel raises, and the engine routes gradients to the XLA path.

Channel kinds: 0 = amplitude_damping, 1 = depolarizing, 2 = phase_damping
(the three non-unitary reference channels, nn/qdense.py:98-104, 1410-1416).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gate_kernel import (
    _SEL_COMPILER_PARAMS,
    _gate_apply,
    _partner,
    _read_g8,
    _to_g8,
    _wire_mask,
)
from .sel import cz_ring_signs, sel_ranges

KIND_IDS = {"amplitude_damping": 0, "depolarizing": 1, "phase_damping": 2}


def _lane_bit_mask(j: int, d: int, B: int, w: int):
    """Lane (column) wire-bit mask: lanes are (sample, col) with period d,
    so col = lane mod d and the wire bit is a plain shift of the lane index
    (d = 2**w)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, B), 1)
    return ((lane >> (w - 1 - j)) & 1) == 1


def _lane_partner(sr, si, bit: int, is1):
    """Lane-axis xor-partner s[:, c ^ bit] via two lane rolls + select.
    Partners never cross a sample boundary (bit < d and lanes have period
    d); the cyclic wrap only touches positions the select masks away."""
    B = sr.shape[1]
    down_r = pltpu.roll(sr, B - bit, axis=1)   # [c] = s[c + bit]
    down_i = pltpu.roll(si, B - bit, axis=1)
    up_r = pltpu.roll(sr, bit, axis=1)         # [c] = s[c - bit]
    up_i = pltpu.roll(si, bit, axis=1)
    return jnp.where(is1, up_r, down_r), jnp.where(is1, up_i, down_i)


def _xor_partner_both(rr, ri, bit: int, rm, lm):
    """rho[i ^ bit, c ^ bit]: row xor-roll (pallas_gate_kernel._partner,
    the same sublane-roll idiom) then lane xor-roll."""
    tr, ti = _partner(rr, ri, bit, rm)
    return _lane_partner(tr, ti, bit, lm)


def _lane_gate_apply(sr, si, g8, j: int, d: int, B: int, w: int):
    """Apply a 2x2 complex gate to the LANE (column) wire bit. Roll+mask on
    the lane axis (lane-dim reshapes are restricted in Mosaic; rolls are
    cheap)."""
    g00r, g00i, g01r, g01i, g10r, g10i, g11r, g11i = g8
    bit = 1 << (w - 1 - j)
    is1 = _lane_bit_mask(j, d, B, w)
    o_r, o_i = _lane_partner(sr, si, bit, is1)
    n_r0 = g00r * sr - g00i * si + g01r * o_r - g01i * o_i
    n_i0 = g00r * si + g00i * sr + g01r * o_i + g01i * o_r
    n_r1 = g10r * o_r - g10i * o_i + g11r * sr - g11i * si
    n_i1 = g10r * o_i + g10i * o_r + g11r * si + g11i * sr
    return jnp.where(is1, n_r1, n_r0), jnp.where(is1, n_i1, n_i0)


def _conj_g8(g8):
    g00r, g00i, g01r, g01i, g10r, g10i, g11r, g11i = g8
    return (g00r, -g00i, g01r, -g01i, g10r, -g10i, g11r, -g11i)


def _apply_channel(rr, ri, kind_id: int, strength, d: int, B: int, w: int):
    """All-wires per-wire channel closed forms on (d, B) planes (exactly
    density.apply_channel_all_wires; channels on distinct wires commute)."""
    if kind_id == 0:  # amplitude damping: mask (1,s;s,1-g) + |1><1| -> |0><0|
        s = jnp.sqrt(1.0 - strength)
        for j in range(w):
            bit = 1 << (w - 1 - j)
            rm = _wire_mask(j, d, B, w)
            lm = _lane_bit_mask(j, d, B, w)
            pr, pi = _xor_partner_both(rr, ri, bit, rm, lm)
            scale = jnp.where(rm, s, 1.0) * jnp.where(lm, s, 1.0)
            keep = jnp.logical_and(jnp.logical_not(rm), jnp.logical_not(lm))
            rr = rr * scale + jnp.where(keep, strength * pr, 0.0)
            ri = ri * scale + jnp.where(keep, strength * pi, 0.0)
        return rr, ri
    if kind_id == 1:  # depolarizing: (1-4p/3) rho + (2p/3) I (x) tr_w(rho)
        c0 = 1.0 - 4.0 * strength / 3.0
        c1 = 2.0 * strength / 3.0
        for j in range(w):
            bit = 1 << (w - 1 - j)
            rm = _wire_mask(j, d, B, w)
            lm = _lane_bit_mask(j, d, B, w)
            pr, pi = _xor_partner_both(rr, ri, bit, rm, lm)
            eq = rm == lm
            rr = c0 * rr + jnp.where(eq, c1 * (rr + pr), 0.0)
            ri = c0 * ri + jnp.where(eq, c1 * (ri + pi), 0.0)
        return rr, ri
    # phase damping: off-diagonal coherence decays per differing wire bit
    s = jnp.sqrt(1.0 - strength)
    for j in range(w):
        rm = _wire_mask(j, d, B, w)
        lm = _lane_bit_mask(j, d, B, w)
        decay = jnp.where(rm != lm, s, 1.0)
        rr = rr * decay
        ri = ri * decay
    return rr, ri


def _lane_coeff_gate_row(rr, ri, c, s, j: int, d: int, B: int, w: int):
    """Row-side RY gate with PER-LANE (per-sample) real coefficients:
    [[c, -s], [s, c]] where c/s are (1, B) planes. Broadcasts over rows."""
    bit = 1 << (w - 1 - j)
    is1 = _wire_mask(j, d, B, w)
    o_r, o_i = _partner(rr, ri, bit, is1)
    # row bit 0: c*own - s*partner ; row bit 1: s*partner(bit0 value) + c*own
    n_r0 = c * rr - s * o_r
    n_i0 = c * ri - s * o_i
    n_r1 = s * o_r + c * rr
    n_i1 = s * o_i + c * ri
    return jnp.where(is1, n_r1, n_r0), jnp.where(is1, n_i1, n_i0)


def _lane_coeff_gate_lane(rr, ri, c, s, j: int, d: int, B: int, w: int):
    """Lane-side RY gate (conj(RY) = RY, real) with per-lane coefficients.
    The lane partner c ^ bit stays within the sample, so the coefficient
    plane is constant across each partner pair."""
    bit = 1 << (w - 1 - j)
    is1 = _lane_bit_mask(j, d, B, w)
    o_r, o_i = _lane_partner(rr, ri, bit, is1)
    n_r0 = c * rr - s * o_r
    n_i0 = c * ri - s * o_i
    n_r1 = s * o_r + c * rr
    n_i1 = s * o_i + c * ri
    return jnp.where(is1, n_r1, n_r0), jnp.where(is1, n_i1, n_i0)


def _dm_fwd_kernel(k: int, w: int, n_layers: int, kind_id: int,
                   ry_encode: bool,
                   er_ref, ei_ref, g_ref, sgr_ref, sgl_ref, s_ref,
                   or_ref, oi_ref):
    d = er_ref.shape[0] if not ry_encode else or_ref.shape[0]
    B = or_ref.shape[1]
    strength = s_ref[0]

    def body(l, carry):
        rr, ri = carry
        if ry_encode:
            # er_ref: (2*w, B) per-sample cos/sin rows; RY_j on both sides
            for j in range(w):
                c = er_ref[j:j + 1, :]
                s = er_ref[w + j:w + j + 1, :]
                rr, ri = _lane_coeff_gate_row(rr, ri, c, s, j, d, B, w)
                rr, ri = _lane_coeff_gate_lane(rr, ri, c, s, j, d, B, w)
        else:
            # encode: rho *= E (E = ph ph^dagger per sample)
            er, ei = er_ref[:], ei_ref[:]
            tr = rr * er - ri * ei
            ti = rr * ei + ri * er
            rr, ri = tr, ti
        rr, ri = _apply_channel(rr, ri, kind_id, strength, d, B, w)
        for li in range(k):
            for j in range(w):
                g = _read_g8(g_ref, l * k + li, j)
                rr, ri = _gate_apply(rr, ri, g, j, d, B, w)        # U rho
                rr, ri = _lane_gate_apply(rr, ri, _conj_g8(g), j, d, B, w)
            sg = sgr_ref[li] * sgl_ref[li]
            rr, ri = rr * sg, ri * sg
        return rr, ri

    row = jax.lax.broadcasted_iota(jnp.int32, (d, B), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, B), 1)
    init = jnp.logical_and(row == 0, lane % d == 0)
    rr = jnp.where(init, 1.0, 0.0).astype(jnp.float32)
    ri = jnp.zeros((d, B), jnp.float32)
    rr, ri = jax.lax.fori_loop(0, n_layers, body, (rr, ri))
    or_ref[:] = rr
    oi_ref[:] = ri


def dm_reupload_chain_pallas(phases, rot_mats, k: int, wires: int,
                             kind: str, strength, interpret: bool = False,
                             ry_angles=None):
    """Run the full dm re-uploading block fused: L x [encode -> channel ->
    SEL(k, CZ)] from rho = |0..0><0..0|.

    phases: (b, d) complex per-sample RZ-phase diagonals (re-applied every
    spectrum layer), or None with ``ry_angles`` (b, wires) for the RY
    re-uploading encode (QIDDM_PL_noise1, reference nn/qdense.py:597-617
    — per-sample RY gates applied to both sides of rho with per-lane
    coefficient planes); rot_mats: (L*k, wires, 2, 2) complex; strength:
    scalar (Python float or traced). Returns rho (b, d, d) complex64.
    """
    kind_id = KIND_IDS[kind]
    ry_encode = ry_angles is not None
    if ry_encode:
        b = ry_angles.shape[0]
        d = 2**wires
        B = b * d
        c = jnp.cos(ry_angles / 2).astype(jnp.float32)   # (b, w)
        s = jnp.sin(ry_angles / 2).astype(jnp.float32)
        # (2w, B): rows 0..w-1 = cos_j per lane, rows w..2w-1 = sin_j
        cs = jnp.concatenate([c, s], axis=1)             # (b, 2w)
        er = jnp.repeat(cs.T, d, axis=1).reshape(2 * wires, B)
        ei = jnp.zeros((1, B), jnp.float32)              # unused
    else:
        b, d = phases.shape
        B = b * d
        # E[i, (s,c)] = ph[s, i] * conj(ph[s, c])
        E = phases[:, :, None] * jnp.conj(phases)[:, None, :]   # (b, d, d)
        planes = jnp.moveaxis(E, 0, 1).reshape(d, B)
        er = jnp.real(planes).astype(jnp.float32)
        ei = jnp.imag(planes).astype(jnp.float32)
    n_layers = rot_mats.shape[0] // k
    g8 = _to_g8(rot_mats)                             # (L*k, w, 8)
    ranges = sel_ranges(k, wires)
    sgn = np.stack([cz_ring_signs(wires, r) for r in ranges])   # (k, d)
    sgr = jnp.asarray(sgn[:, :, None], jnp.float32)             # (k, d, 1)
    sgl = jnp.asarray(np.tile(sgn, (1, b))[:, None, :], jnp.float32)
    s_in = jnp.asarray(strength, jnp.float32).reshape(1)
    kern = functools.partial(_dm_fwd_kernel, k, wires, n_layers, kind_id,
                             ry_encode)
    rr, ri = pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
        ],
        interpret=interpret,
    )(er, ei, g8, sgr, sgl, s_in)
    rho = (rr + 1j * ri).reshape(d, b, d)
    return jnp.moveaxis(rho, 1, 0)
