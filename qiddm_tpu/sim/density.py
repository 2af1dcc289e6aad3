"""Batched density-matrix simulation (the ``default.mixed`` analogue).

Used when a circuit contains non-unitary channels (``add_noise`` modes with
damping/depolarizing). States are ``(batch, 2**w, 2**w)`` complex density
matrices; all operations are batched einsums/matmuls so the TPU sees large
dense contractions, not per-wire Python work.

Memory: dm mode squares the qubit cost (2**2w amplitudes). The QIDDM noise
sweeps run at w <= 10 (rho <= 1M complex per sample), evaluated at small test
batches (reference src/mnist_noise.py uses 10 sample images) — fine on a 16GB
chip. A guard raises above 12 wires.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .. import config as _config
from .statevector import rz_phases

MAX_DM_WIRES = 12


def _nwires(rho):
    return int(math.log2(rho.shape[-1]))


def from_statevector(states):
    """|psi><psi| for a batch of pure states: (b, d) -> (b, d, d)."""
    wires = int(math.log2(states.shape[-1]))
    if wires > MAX_DM_WIRES:
        raise ValueError(
            f"density-matrix mode capped at {MAX_DM_WIRES} wires "
            f"(rho would be {4**wires} complex amplitudes per sample); "
            f"got {wires} — use the Monte-Carlo trajectory backend "
            f"(sim/trajectories.py, n_traj=...) for wide noisy circuits")
    return states[:, :, None] * jnp.conj(states)[:, None, :]


def zero_density(batch: int, wires: int, dtype=jnp.complex64):
    if wires > MAX_DM_WIRES:
        raise ValueError(
            f"density-matrix mode capped at {MAX_DM_WIRES} wires, got "
            f"{wires} — use the Monte-Carlo trajectory backend "
            f"(sim/trajectories.py, n_traj=...) for wide noisy circuits")
    dim = 2**wires
    rho = jnp.zeros((batch, dim, dim), dtype=dtype)
    return rho.at[:, 0, 0].set(1.0)


def apply_unitary(rho, unitary):
    """rho -> U rho U^dagger (two batched matmuls)."""
    return jnp.einsum("ij,bjk,lk->bil", unitary, rho, jnp.conj(unitary),
                      precision=_config.matmul_precision())


def apply_chain_two_sided(rho, chain_fn):
    """rho -> U rho U^dagger with U supplied as a statevector gate chain.

    ``chain_fn`` maps a ``(B, d)`` batch of statevectors to ``U @ states``.
    Uses rho's Hermiticity: with ``f(M) = U M`` (columns of M treated as
    states), ``(U rho)^dagger = rho U^dagger``, so
    ``U rho U^dagger = f((f(rho))^dagger)`` — two gate-chain passes over
    ``b*d`` states. This replaces apply_unitary's two ``(b*d, d) x (d, d)``
    complex matmuls (O(b d^3) fp32-highest MXU work, plus the O(k d^3)
    unitary composition) with O(gates * b * d^2) elementwise work that the
    fused Pallas SEL chain runs VMEM-resident — the winning trade at the
    reference noise-sweep shapes (batch 10, d=256; measured in
    results/dm_unitary_ab.json). Exact up to fp rounding and the Hermiticity
    of rho (preserved by every CPTP step of the dm path).
    """
    b, d, _ = rho.shape

    def left(m):
        cols = jnp.swapaxes(m, 1, 2).reshape(b * d, d)
        out = chain_fn(cols)
        return jnp.swapaxes(out.reshape(b, d, d), 1, 2)

    return left(jnp.conj(jnp.swapaxes(left(rho), 1, 2)))


def apply_diag(rho, diag):
    """Apply a diagonal unitary given as (batch, d) phases: rho_ij *= d_i d_j*."""
    return rho * (diag[:, :, None] * jnp.conj(diag)[:, None, :])


def rz_encode(rho, x):
    """Per-wire RZ data encoding on a density matrix (diagonal unitary)."""
    return apply_diag(rho, rz_phases(x, _nwires(rho)))


def apply_1q_kraus(rho, kraus, wire: int):
    """Apply a single-qubit channel ``rho -> sum_k K rho K^dagger`` on a wire.

    kraus: (n_k, 2, 2) complex array.
    """
    w = _nwires(rho)
    b = rho.shape[0]
    left = 2**wire
    right = 2 ** (w - wire - 1)
    # rho indexed (b, l x r, l' x' r') with x the target wire bit.
    r = rho.reshape(b, left, 2, right, left, 2, right)
    out = jnp.einsum("kxy,blyrmzs,kwz->blxrmws", kraus, r, jnp.conj(kraus),
                     precision=_config.matmul_precision())
    return out.reshape(b, left * 2 * right, left * 2 * right)


def apply_kraus_all_wires(rho, kraus):
    """Apply the same single-qubit channel to every wire in sequence
    (matches the reference's per-wire noise loops, nn/qdense.py:98-104)."""
    for j in range(_nwires(rho)):
        rho = apply_1q_kraus(rho, kraus, j)
    return rho


# --- closed-form channel applications --------------------------------------
# The reference's three non-unitary channels have structure the generic
# Kraus einsum wastes: phase damping is DIAGONAL (the all-wires pass is one
# precomputed Hadamard mask on rho), and damping/depolarizing reduce to
# elementwise block scalings plus one block move/trace each — O(B d^2)
# cheap VPU ops with no tiny-axis contractions.

def _phase_damp_mask(wires: int, gamma, dtype):
    """All-wires phase damping: rho'[i,j] = rho[i,j] * s^hamming(i xor j),
    s = sqrt(1-gamma) (off-diagonal coherence decays per differing bit;
    diagonals untouched). Built on device from iotas — a host-side cache
    would retain an O(4^wires) array per (wires, gamma) across intensity
    sweeps and bake each one into its program as a constant. ``gamma`` may
    be a traced scalar (the vmapped-intensity sweep path)."""
    i = jnp.arange(2**wires, dtype=jnp.int32)
    x = i[:, None] ^ i[None, :]
    ham = jnp.zeros_like(x)
    for _ in range(wires):
        ham = ham + (x & 1)
        x = x >> 1
    rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    s = jnp.sqrt(1.0 - jnp.asarray(gamma, rdt))
    return jnp.power(s, ham.astype(rdt)).astype(dtype)


def _amp_damp_wire(rho, gamma, wire: int, wires: int):
    """K0 = diag(1, s), K1 = [[0, sqrt(g)], [0, 0]]: elementwise mask
    (1, s; s, 1-g) on the wire's 2x2 block grid plus the |1><1| block
    moving to |0><0| with weight g."""
    b = rho.shape[0]
    left, right = 2**wire, 2 ** (wires - wire - 1)
    r = rho.reshape(b, left, 2, right, left, 2, right)
    gamma = jnp.asarray(gamma, rho.real.dtype)
    s = jnp.sqrt(1.0 - gamma)
    c = jnp.stack([jnp.ones_like(s), s])
    m = (c[:, None] * c[None, :]).astype(rho.dtype)
    out = r * m.reshape(1, 1, 2, 1, 1, 2, 1)
    out = out.at[:, :, 0, :, :, 0, :].add(gamma * r[:, :, 1, :, :, 1, :])
    return out.reshape(b, left * 2 * right, left * 2 * right)


def _depol_wire(rho, p, wire: int, wires: int):
    """XrX + YrY + ZrZ = 2 tr_w(r) (x) I - r, so the depolarizing channel
    is rho' = (1 - 4p/3) rho + (2p/3) I (x) tr_w(rho)."""
    b = rho.shape[0]
    left, right = 2**wire, 2 ** (wires - wire - 1)
    r = rho.reshape(b, left, 2, right, left, 2, right)
    t = r[:, :, 0, :, :, 0, :] + r[:, :, 1, :, :, 1, :]
    out = (1.0 - 4.0 * p / 3.0) * r
    out = out.at[:, :, 0, :, :, 0, :].add((2.0 * p / 3.0) * t)
    out = out.at[:, :, 1, :, :, 1, :].add((2.0 * p / 3.0) * t)
    return out.reshape(b, left * 2 * right, left * 2 * right)


def apply_channel_all_wires(rho, kind: str, strength):
    """Closed-form all-wires application of the reference's channels.

    Exactly equals ``apply_kraus_all_wires(rho, kraus_for(kind, strength))``
    (channels on distinct wires commute); used by the engine for the three
    non-unitary kinds. ``strength`` may be a traced scalar. Raises KeyError
    for kinds without a closed form.

    Phase damping is DIAGONAL (one fused mask multiply). Damping and
    depolarizing dispatch on ``config.dm_channel_mode()``: the default
    "perwire" closed forms (a masked block pass per wire — measured faster
    on-chip, results/dm_mode_ab.json, DESIGN.md), or "grouped"
    (:func:`apply_channel_all_wires_grouped`): wires fuse into groups of 4
    and each group is ONE dense (4^g x 4^g) superoperator contraction —
    MXU matmul work instead of a per-wire chain of masked block
    scatter-adds (2 ops for 8 wires instead of 16+; VERDICT r2 item 7).
    """
    w = _nwires(rho)
    if kind == "phase_damping":
        mask = _phase_damp_mask(w, strength, rho.dtype)
        return rho * mask[None]
    if kind in ("amplitude_damping", "depolarizing"):
        if _config.dm_channel_mode() == "grouped":
            from .channels import kraus_for

            return apply_channel_all_wires_grouped(
                rho, kraus_for(kind, strength))
        if kind == "amplitude_damping":
            for j in range(w):
                rho = _amp_damp_wire(rho, strength, j, w)
            return rho
        p = jnp.asarray(strength, rho.real.dtype)
        for j in range(w):
            rho = _depol_wire(rho, p, j, w)
        return rho
    raise KeyError(kind)


# --- grouped transfer-matrix channel application ----------------------------
# A single-qubit channel rho -> sum_K K rho K^dag is a linear superoperator
# T[(x,y),(a,b)] = sum_K K[x,a] conj(K[y,b]) on the wire's (row, col) bit
# pair. Channels on distinct wires commute and tensor, so an all-wires pass
# groups wires and contracts each group's Kronecker-power superoperator in
# ONE einsum — a (4^g)-dim dense contraction the MXU eats, replacing the
# per-wire loop of reshape + masked scatter-add ops that left the TPU
# scheduling dozens of tiny VPU kernels per pass.

def transfer_tensor(kraus):
    """(n_k, 2, 2) Kraus stack -> (2, 2, 2, 2) superoperator [x, y, a, b]."""
    k = jnp.asarray(kraus)
    return jnp.einsum("kxa,kyb->xyab", k, jnp.conj(k))


def _group_transfer(t, g: int):
    """Kronecker power of a per-wire superoperator onto a g-wire group:
    (2,2,2,2) -> (2^g, 2^g, 2^g, 2^g) as [X, Y, A, B] with X/A row bits
    and Y/B col bits in wire order."""
    out = t
    for _ in range(g - 1):
        out = jnp.einsum("XYAB,xyab->XxYyAaBb", out, t)
        s = out.shape
        out = out.reshape(s[0] * s[1], s[2] * s[3], s[4] * s[5],
                          s[6] * s[7])
    return out


def apply_channel_all_wires_grouped(rho, kraus, group: int = 4):
    """Apply the same 1q channel to every wire via grouped superoperator
    contractions. Exactly equals :func:`apply_kraus_all_wires` (tested);
    ``group`` caps the fused group width (T_g holds 16^g entries — 512 kB
    complex64 at g=4)."""
    w = _nwires(rho)
    b = rho.shape[0]
    t1 = transfer_tensor(kraus).astype(rho.dtype)
    pos = 0
    while pos < w:
        g = min(group, w - pos)
        tg = _group_transfer(t1, g) if g > 1 else t1
        left = 2**pos
        dim_g = 2**g
        right = 2 ** (w - pos - g)
        r = rho.reshape(b, left, dim_g, right, left, dim_g, right)
        rho = jnp.einsum("XYac,blarmcs->blXrmYs", tg, r,
                         precision=_config.matmul_precision()
                         ).reshape(b, left * dim_g * right,
                                   left * dim_g * right)
        pos += g
    return rho


def probs(rho):
    """Diagonal of rho (clipped to real)."""
    d = jnp.diagonal(rho, axis1=-2, axis2=-1)
    return jnp.real(d)


def expval_z(rho):
    from .statevector import z_sign_table

    w = _nwires(rho)
    p = probs(rho)
    signs = jnp.asarray(z_sign_table(w), dtype=p.dtype)
    return jnp.matmul(p, signs, precision=_config.matmul_precision())
