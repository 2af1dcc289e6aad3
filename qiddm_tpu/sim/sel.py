"""StronglyEntanglingLayers (SEL) as dense composed unitaries.

The reference's variational ansatz everywhere is
``qml.StronglyEntanglingLayers`` (reference nn/qdense.py:44, :428, :1305 ...):
per layer, a 3-parameter rotation on every wire followed by a ring of
two-qubit imprimitives (CNOT by default, CZ for the QIDDM family) whose
"range" r cycles ``r_l = (l mod (wires-1)) + 1``.

TPU-native realization: a block is *data independent*, so we compose it into
one ``(2**w, 2**w)`` unitary per block per step and apply it to the entire
image batch with a single complex matmul. Composition is built to keep the
XLA program SIZE constant in depth (compile time matters as much as run
time on TPU):

* per-wire rotations for ALL layers at once form a batched Kronecker chain —
  ``wires-1`` einsum ops total, regardless of layer count;
* a CZ ring of any range is a fixed diagonal sign vector; a CNOT ring is a
  fixed basis permutation (both precomputed in numpy) — applied to all
  layers with one batched gather/multiply;
* layers compose with one ``lax.scan`` of matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as _config
from .gates import rot_matrix
from .statevector import bit_table


def sel_ranges(n_layers: int, n_wires: int) -> list[int]:
    """Default imprimitive ranges: ``r_l = (l % (n_wires-1)) + 1``."""
    if n_wires == 1:
        return [0] * n_layers
    return [(l % (n_wires - 1)) + 1 for l in range(n_layers)]


@functools.lru_cache(maxsize=None)
def cz_ring_signs(wires: int, rng: int) -> np.ndarray:
    """Diagonal of the CZ ring ``prod_j CZ(j, (j+rng) % wires)``.

    CZ gates commute, so the ring is the product of their +-1 diagonals.
    Returns (2**wires,) float64 of +-1.
    """
    bits = bit_table(wires).astype(np.int64)
    signs = np.ones(2**wires, dtype=np.int64)
    if wires == 1 or rng == 0:
        return signs.astype(np.float64)
    for j in range(wires):
        k = (j + rng) % wires
        signs *= 1 - 2 * (bits[:, j] & bits[:, k])
    return signs.astype(np.float64)


@functools.lru_cache(maxsize=None)
def cnot_ring_perm(wires: int, rng: int) -> np.ndarray:
    """Row-gather indices realizing the sequential CNOT ring.

    The ring applies ``CNOT(j, (j+rng) % wires)`` for j = 0..wires-1 *in
    order* (later gates see earlier gates' flips). Each basis state maps to
    exactly one basis state: target_bit ^= control_bit sequentially.

    Returns ``inv`` such that ``(U_ring @ M) == M[inv, :]`` for any matrix M.
    """
    dim = 2**wires
    if wires == 1 or rng == 0:
        return np.arange(dim)
    f = np.empty(dim, dtype=np.int64)
    for i in range(dim):
        b = [(i >> (wires - 1 - j)) & 1 for j in range(wires)]
        for j in range(wires):
            k = (j + rng) % wires
            b[k] ^= b[j]
        f[i] = sum(bj << (wires - 1 - j) for j, bj in enumerate(b))
    inv = np.empty(dim, dtype=np.int64)
    inv[f] = np.arange(dim)
    return inv


def _batched_kron_chain(mats):
    """Batched Kronecker product over the wire axis.

    mats: (..., wires, 2, 2) -> (..., 2**wires, 2**wires), wire 0 = MSB.
    ``wires - 1`` steps regardless of the leading batch shape.

    Built by 2x2 BLOCK assembly from the least-significant wire up
    (``u <- kron(m_j, u)``) so every intermediate is a plain row-major
    (..., p, p) matrix — the naive interleaved-einsum construction creates
    (..., p, 2, p, 2) temporaries whose tiny trailing dims TPU pads ~40x
    (observed 30GB HLO temp for a depth-60, 10-wire block).
    """
    wires = mats.shape[-3]
    u = mats[..., wires - 1, :, :]
    for j in range(wires - 2, -1, -1):
        m = mats[..., j, :, :]
        top = jnp.concatenate(
            [m[..., 0:1, 0:1] * u, m[..., 0:1, 1:2] * u], axis=-1)
        bot = jnp.concatenate(
            [m[..., 1:2, 0:1] * u, m[..., 1:2, 1:2] * u], axis=-1)
        u = jnp.concatenate([top, bot], axis=-2)
    return u


def _entangled_layers(weights, imprimitive: str):
    """All layers' (rotation-kron x ring) unitaries, batched.

    weights: (layers, wires, 3) -> (layers, d, d). Program size O(wires).
    """
    layers, wires, _ = weights.shape
    mats = rot_matrix(weights[..., 0], weights[..., 1], weights[..., 2])
    layer_u = _batched_kron_chain(mats)  # (layers, d, d)
    if wires == 1:
        return layer_u
    ranges = sel_ranges(layers, wires)
    if imprimitive == "cz":
        signs = np.stack([cz_ring_signs(wires, r) for r in ranges])
        return jnp.asarray(signs[:, :, None], layer_u.dtype) * layer_u
    if imprimitive == "cnot":
        inv = np.stack([cnot_ring_perm(wires, r) for r in ranges])
        return jnp.take_along_axis(
            layer_u, jnp.asarray(inv)[:, :, None], axis=1)
    raise ValueError(f"unknown imprimitive {imprimitive!r}")


def sel_unitary(weights, imprimitive: str = "cnot"):
    """Compose an SEL block into a dense unitary.

    weights: (layers, wires, 3) -> (2**wires, 2**wires). Composition is a
    ``lax.scan`` of matmuls: constant program size in depth.
    """
    layers = weights.shape[0]
    lus = _entangled_layers(weights, imprimitive)

    if layers == 1:
        return lus[0]

    prec = _config.matmul_precision()

    def body(acc, u):
        return jnp.matmul(u, acc, precision=prec), None

    acc, _ = jax.lax.scan(body, lus[0], lus[1:])
    return acc


def sel_layer_unitaries(weights, imprimitive: str = "cz"):
    """Per-layer entangled unitaries WITHOUT composition.

    weights: (n_blocks, k, wires, 3) -> (n_blocks, k, d, d): each layer's
    (rotation-kron x ring) unitary, with the range cycle restarting per block
    (the reference instantiates a fresh template per spectrum layer).
    """
    n_blocks, k, wires, _ = weights.shape
    dim = 2**wires
    # flatten (n_blocks, k) -> one batch axis: 4-D (n, k, d, d) intermediates
    # backward ~6x slower on TPU than 3-D (copies on the extra axis)
    flat = weights.reshape(n_blocks * k, wires, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
    layer_u = _batched_kron_chain(mats)  # (n_blocks*k, d, d)
    if wires > 1:
        ranges = sel_ranges(k, wires)
        if imprimitive == "cz":
            signs = np.stack([cz_ring_signs(wires, r) for r in ranges])
            signs = np.tile(signs, (n_blocks, 1))  # (n_blocks*k, d)
            layer_u = jnp.asarray(signs[:, :, None], layer_u.dtype) * layer_u
        elif imprimitive == "cnot":
            inv = np.stack([cnot_ring_perm(wires, r) for r in ranges])
            inv = np.tile(inv, (n_blocks, 1))
            layer_u = jnp.take_along_axis(
                layer_u, jnp.asarray(inv)[:, :, None], axis=1)
        else:
            raise ValueError(f"unknown imprimitive {imprimitive!r}")
    return layer_u.reshape(n_blocks, k, dim, dim)


def sel_unitaries(weights, imprimitive: str = "cz"):
    """Batched block composition for the re-uploading family.

    weights: (n_blocks, k, wires, 3) -> (n_blocks, d, d). Composing costs
    O(k d^3) per block — worth it only when the data batch exceeds d; below
    that, apply ``sel_layer_unitaries`` to the state batch directly.
    """
    n_blocks, k, wires, _ = weights.shape
    layer_u = sel_layer_unitaries(weights, imprimitive)
    prec = _config.matmul_precision()
    u = layer_u[:, 0]
    for l in range(1, k):  # k <= 3 in every reference config
        u = jnp.einsum("bij,bjk->bik", layer_u[:, l], u, precision=prec)
    return u


def sel_apply_gates(states, weights, imprimitive: str = "cnot"):
    """Apply SEL gate-by-gate under a ``lax.scan`` over layers.

    The small-batch fast path: per layer it does ``wires`` single-qubit
    applies (O(B d) each) plus one ring (diagonal multiply for CZ, row
    gather for CNOT) — O(layers * wires * B * d) total, vs the per-layer
    unitary path's O(layers * d^2 * (assembly + B)) — with O(1) program
    size in ``layers``. Used by qdense_circuit when batch << 2**wires
    (measured on TPU: see DESIGN.md "gate-level vs unitary").
    """
    import jax

    from .statevector import apply_1q

    layers, wires, _ = weights.shape
    mats = rot_matrix(weights[..., 0], weights[..., 1],
                      weights[..., 2]).astype(states.dtype)
    ranges = sel_ranges(layers, wires)
    if wires == 1:
        ring = jnp.zeros((layers, 1))
    elif imprimitive == "cz":
        ring = jnp.asarray(
            np.stack([cz_ring_signs(wires, r) for r in ranges]))
    elif imprimitive == "cnot":
        ring = jnp.asarray(
            np.stack([cnot_ring_perm(wires, r) for r in ranges]))
    else:
        raise ValueError(f"unknown imprimitive {imprimitive!r}")

    def body(states, inp):
        m, r = inp
        for j in range(wires):
            states = apply_1q(states, m[j], j, wires)
        if wires > 1:
            if imprimitive == "cz":
                states = states * r[None, :].astype(states.dtype)
            else:
                states = jnp.take(states, r, axis=1)
        return states, None

    states, _ = jax.lax.scan(body, states, (mats, ring))
    return states


def sel_apply_direct(states, weights, imprimitive: str = "cnot"):
    """Apply SEL gate-by-gate to a batch of states (no composition).

    Reference-faithful per-gate path; used for cross-checking the composed
    unitary and preferable when ``batch >> 2**wires``.
    """
    from .statevector import apply_1q

    layers, wires, _ = weights.shape
    ranges = sel_ranges(layers, wires)
    for l in range(layers):
        mats = rot_matrix(weights[l, :, 0], weights[l, :, 1], weights[l, :, 2])
        for j in range(wires):
            states = apply_1q(states, mats[j].astype(states.dtype), j, wires)
        if wires > 1:
            if imprimitive == "cz":
                signs = jnp.asarray(cz_ring_signs(wires, ranges[l]))
                states = states * signs[None, :].astype(states.dtype)
            else:
                inv = jnp.asarray(cnot_ring_perm(wires, ranges[l]))
                states = states[:, inv]
    return states
