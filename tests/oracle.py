"""Independent numpy oracle simulator for validating qiddm_tpu.sim.

Deliberately built a *different* way from the production simulator: every gate
is embedded into the full 2**w space with explicit Kronecker products and
applied sequentially as dense matrix-vector products (complex128). Slow and
simple — exists only to cross-check the TPU engine's semantics (gate
conventions, SEL range pattern, embeddings, channels).
"""

from __future__ import annotations

import numpy as np

I2 = np.eye(2, dtype=np.complex128)
P0 = np.array([[1, 0], [0, 0]], dtype=np.complex128)
P1 = np.array([[0, 0], [0, 1]], dtype=np.complex128)
X = np.array([[0, 1], [1, 0]], dtype=np.complex128)
Z = np.diag([1.0, -1.0]).astype(np.complex128)


def rz(t):
    return np.diag([np.exp(-0.5j * t), np.exp(0.5j * t)]).astype(np.complex128)


def ry(t):
    c, s = np.cos(t / 2), np.sin(t / 2)
    return np.array([[c, -s], [s, c]], dtype=np.complex128)


def rot(phi, theta, omega):
    return rz(omega) @ ry(theta) @ rz(phi)


def embed_1q(gate, wire, wires):
    mats = [I2] * wires
    mats[wire] = gate
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def embed_ctrl(gate, control, target, wires):
    """Controlled-<gate> with arbitrary control/target positions."""
    a = [I2] * wires
    a[control] = P0
    term0 = a[0]
    for m in a[1:]:
        term0 = np.kron(term0, m)
    b = [I2] * wires
    b[control] = P1
    b[target] = gate
    term1 = b[0]
    for m in b[1:]:
        term1 = np.kron(term1, m)
    return term0 + term1


def sel_matrix(weights, wires, imprimitive="cnot"):
    """Full-space unitary of StronglyEntanglingLayers."""
    layers = weights.shape[0]
    dim = 2**wires
    u = np.eye(dim, dtype=np.complex128)
    for l in range(layers):
        for j in range(wires):
            g = rot(*weights[l, j])
            u = embed_1q(g, j, wires) @ u
        if wires > 1:
            r = (l % (wires - 1)) + 1
            for j in range(wires):
                k = (j + r) % wires
                imp = X if imprimitive == "cnot" else Z
                u = embed_ctrl(imp, j, k, wires) @ u
    return u


def amplitude_embed(x, wires, pad_with):
    dim = 2**wires
    v = np.concatenate([x, np.full(dim - len(x), pad_with)])
    return (v / np.linalg.norm(v)).astype(np.complex128)


def rz_encode_state(state, angles, wires):
    for j, t in enumerate(angles):
        state = embed_1q(rz(t), j, wires) @ state
    return state


def probs(state):
    return np.abs(state) ** 2


def expval_z(state, wires):
    p = probs(state)
    out = []
    for j in range(wires):
        signs = np.array(
            [1.0 - 2.0 * ((i >> (wires - 1 - j)) & 1) for i in range(2**wires)]
        )
        out.append(np.sum(p * signs))
    return np.array(out)


def apply_kraus(rho, kraus_ops, wire, wires):
    out = np.zeros_like(rho)
    for k in kraus_ops:
        kk = embed_1q(k, wire, wires)
        out += kk @ rho @ kk.conj().T
    return out
