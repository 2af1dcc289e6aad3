"""Kraus operators for the hardware-noise channels swept by the reference.

The reference injects these per-wire inside/after its circuits via an
``add_noise`` integer (reference nn/qdense.py:98-104, :174-180, :1410-1416)
and simulates them with the external ``default.mixed`` density-matrix device
at test time (reference src/mnist_noise.py:214-230). Strengths differ per
model family; call sites pass them explicitly.

``add_noise`` codes (reference semantics):
  1 -> PhaseShift (Qdense family) or PhaseDamping (QIDDM family)
  2 -> AmplitudeDamping
  3 -> DepolarizingChannel
  4 -> "Rotation Angle error" — swept by reference src/mnist_noise.py:432 but
       missing from the released circuits (SURVEY §8.8); reconstructed here as
       a deterministic over-rotation of the encoding angles by
       ``noise_intensity`` radians.
"""

from __future__ import annotations

import cmath
import math

import numpy as np

from .gates import I2, X, Y, Z

# basis matrices: builders are written as linear combinations of these so a
# TRACED strength (jnp scalar) flows straight through — the Kraus values are
# smooth in the strength, which is what lets intensity sweeps run as ONE
# compiled program vmapped over the intensity axis (VERDICT r2 item 2).
_E00 = np.array([[1.0, 0.0], [0.0, 0.0]], dtype=np.complex128)
_E01 = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=np.complex128)
_E11 = np.array([[0.0, 0.0], [0.0, 1.0]], dtype=np.complex128)


def _sqrt(v):
    if isinstance(v, (int, float)):
        return math.sqrt(v)
    import jax.numpy as jnp

    return jnp.sqrt(v)


def phase_shift(phi) -> list:
    """Unitary phase shift diag(1, e^{i phi}) as a single-element Kraus set."""
    if isinstance(phi, (int, float)):
        return [_E00 + cmath.exp(1j * phi) * _E11]
    import jax.numpy as jnp

    return [_E00 + jnp.exp(1j * phi) * _E11]


def phase_damping(gamma) -> list:
    return [_E00 + _sqrt(1.0 - gamma) * _E11, _sqrt(gamma) * _E11]


def amplitude_damping(gamma) -> list:
    return [_E00 + _sqrt(1.0 - gamma) * _E11, _sqrt(gamma) * _E01]


def depolarizing(p) -> list:
    s = _sqrt(p / 3.0)
    return [_sqrt(1.0 - p) * I2, s * X, s * Y, s * Z]


def kraus_for(kind: str, strength) -> list:
    if kind == "phase_shift":
        return phase_shift(strength)
    if kind == "phase_damping":
        return phase_damping(strength)
    if kind == "amplitude_damping":
        return amplitude_damping(strength)
    if kind == "depolarizing":
        return depolarizing(strength)
    raise ValueError(f"unknown channel kind {kind!r}")
