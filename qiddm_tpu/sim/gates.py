"""Parameterized gate matrices and weight re-mappings.

Conventions follow the simulator semantics the reference relies on through
PennyLane (reference nn/qdense.py uses RZ/RY encodings, ``qml.Rot`` inside
``StronglyEntanglingLayers``, CZ/CNOT imprimitives):

* Basis ordering: wire 0 is the *most significant* bit of the computational
  basis index (state ``|q0 q1 ... q_{w-1}>`` has index ``sum q_j 2^{w-1-j}``).
* ``RZ(t) = diag(e^{-it/2}, e^{+it/2})``
* ``RY(t) = [[cos t/2, -sin t/2], [sin t/2, cos t/2]]``
* ``Rot(phi, theta, omega) = RZ(omega) @ RY(theta) @ RZ(phi)``

All functions are shape-polymorphic over leading batch dimensions and
differentiable.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def rz_matrix(theta):
    """RZ gate; ``theta`` may have any leading batch shape -> (..., 2, 2)."""
    theta = jnp.asarray(theta)
    zero = jnp.zeros_like(theta)
    em = jnp.exp(-0.5j * theta.astype(jnp.result_type(theta, jnp.complex64)))
    ep = jnp.conj(em)
    return jnp.stack(
        [
            jnp.stack([em, zero.astype(em.dtype)], axis=-1),
            jnp.stack([zero.astype(em.dtype), ep], axis=-1),
        ],
        axis=-2,
    )


def ry_matrix(theta):
    """RY gate -> (..., 2, 2) (real rotation, returned as complex)."""
    theta = jnp.asarray(theta)
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    m = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    return m.astype(jnp.result_type(m, jnp.complex64))


def rot_matrix(phi, theta, omega):
    """General single-qubit rotation ``Rot(phi, theta, omega)``.

    Matches the ZYZ decomposition used by the reference's entangling-layer
    template (each wire applies a 3-parameter rotation,
    reference nn/qdense.py:29-32 weight shape ``(..., wires, 3)``)::

        [[e^{-i(phi+omega)/2} cos(t/2), -e^{i(phi-omega)/2} sin(t/2)],
         [e^{-i(phi-omega)/2} sin(t/2),  e^{i(phi+omega)/2} cos(t/2)]]
    """
    phi, theta, omega = (jnp.asarray(a) for a in (phi, theta, omega))
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    a = jnp.exp(-0.5j * (phi + omega)) * c
    b = -jnp.exp(0.5j * (phi - omega)) * s
    cc = jnp.exp(-0.5j * (phi - omega)) * s
    d = jnp.exp(0.5j * (phi + omega)) * c
    return jnp.stack(
        [jnp.stack([a, b], axis=-1), jnp.stack([cc, d], axis=-1)], axis=-2
    )


# --- fixed single-qubit matrices (numpy; used to build Kraus sets etc.) ---

I2 = np.eye(2, dtype=np.complex128)
X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=np.complex128)
Y = np.array([[0.0, -1.0j], [1.0j, 0.0]], dtype=np.complex128)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=np.complex128)
H = np.array([[1.0, 1.0], [1.0, -1.0]], dtype=np.complex128) / math.sqrt(2.0)


def phase_shift_matrix(phi: float) -> np.ndarray:
    """PhaseShift(phi) = diag(1, e^{i phi}) (reference nn/qdense.py:100)."""
    return np.array([[1.0, 0.0], [0.0, np.exp(1j * phi)]], dtype=np.complex128)


# --- weight re-mappings -----------------------------------------------------

def qw_tanh(w):
    """``qw_map.tanh`` re-mapping used by the Qdense/QConv circuits.

    The reference maps unbounded trainable weights into the full rotation
    interval ``[-pi, pi]`` via a scaled tanh before feeding them to the
    entangling layers (reference nn/qdense.py:45, nn/qconv.py:55; the
    ``qw_map`` package implements interval re-mappings from the
    "Weight Re-Mapping for Variational Quantum Algorithms" line of work).
    """
    return jnp.pi * jnp.tanh(w)


def plain_tanh(w):
    """Plain tanh mapping (reference nn/qdense.py:97 uses ``torch.tanh``)."""
    return jnp.tanh(w)


WEIGHT_MAPS = {
    "none": lambda w: w,
    "qw_tanh": qw_tanh,
    "tanh": plain_tanh,
}
