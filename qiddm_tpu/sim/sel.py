"""StronglyEntanglingLayers (SEL) as dense composed unitaries.

The reference's variational ansatz everywhere is
``qml.StronglyEntanglingLayers`` (reference nn/qdense.py:44, :428, :1305 ...):
per layer, a 3-parameter rotation on every wire followed by a ring of
two-qubit imprimitives (CNOT by default, CZ for the QIDDM family) whose
"range" r cycles ``r_l = (l mod (wires-1)) + 1``.

TPU-native realization: the whole block is *data independent*, so we compose
it into one ``(2**w, 2**w)`` unitary per block per step and apply it to the
entire image batch with a single complex matmul (`statevector.apply_unitary`).
That turns the reference's per-sample Python loops (e.g. reference
nn/qdense.py:1631-1635) into pure MXU work. Composition itself is one small
matmul per layer:

* the per-wire rotations form a Kronecker product of 2x2 matrices;
* a CZ ring of any range is a *fixed diagonal* sign vector;
* a CNOT ring of any range is a *fixed basis permutation* (computed once in
  numpy at trace time — the sequential bit updates are data independent).
"""

from __future__ import annotations

import functools
import math

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

    Returns ``inv`` such that ``(U_ring @ M) == M[inv, :]`` for any matrix M,
    i.e. ``inv[r] = f^{-1}(r)`` where ``f`` is the basis permutation.
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


def _kron_rot_layer(layer_weights):
    """Kronecker product of per-wire Rot matrices.

    layer_weights: (wires, 3) -> (2**wires, 2**wires) complex.
    """
    wires = layer_weights.shape[0]
    mats = rot_matrix(
        layer_weights[:, 0], layer_weights[:, 1], layer_weights[:, 2]
    )  # (wires, 2, 2)
    u = mats[0]
    for j in range(1, wires):
        u = jnp.kron(u, mats[j])
    return u


def sel_unitary(weights, imprimitive: str = "cnot", start_layer: int = 0):
    """Compose an SEL block into a dense unitary.

    weights: (layers, wires, 3). ``start_layer`` offsets the range cycle when
    a block logically continues a deeper template (the reference always
    restarts the template per block — call sites use the default 0).
    """
    layers, wires, _ = weights.shape
    ranges = sel_ranges(layers + start_layer, wires)[start_layer:]
    dim = 2**wires
    u = None
    for l in range(layers):
        layer_u = _kron_rot_layer(weights[l])
        if wires > 1:
            if imprimitive == "cz":
                signs = jnp.asarray(cz_ring_signs(wires, ranges[l]))
                layer_u = signs[:, None].astype(layer_u.dtype) * layer_u
            elif imprimitive == "cnot":
                inv = jnp.asarray(cnot_ring_perm(wires, ranges[l]))
                layer_u = layer_u[inv, :]
            else:
                raise ValueError(f"unknown imprimitive {imprimitive!r}")
        u = layer_u if u is None else jnp.matmul(
            layer_u, u, precision=_config.matmul_precision())
    if u is None:
        u = jnp.eye(dim, dtype=jnp.complex64)
    return u


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
