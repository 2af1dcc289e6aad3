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

import math

import numpy as np

from .gates import I2, X, Y, Z, phase_shift_matrix


def phase_shift(phi: float) -> list[np.ndarray]:
    """Unitary phase shift diag(1, e^{i phi}) as a single-element Kraus set."""
    return [phase_shift_matrix(phi)]


def phase_damping(gamma: float) -> list[np.ndarray]:
    return [
        np.array([[1.0, 0.0], [0.0, math.sqrt(1.0 - gamma)]], dtype=np.complex128),
        np.array([[0.0, 0.0], [0.0, math.sqrt(gamma)]], dtype=np.complex128),
    ]


def amplitude_damping(gamma: float) -> list[np.ndarray]:
    return [
        np.array([[1.0, 0.0], [0.0, math.sqrt(1.0 - gamma)]], dtype=np.complex128),
        np.array([[0.0, math.sqrt(gamma)], [0.0, 0.0]], dtype=np.complex128),
    ]


def depolarizing(p: float) -> list[np.ndarray]:
    s = math.sqrt(p / 3.0)
    return [
        math.sqrt(1.0 - p) * I2,
        s * X,
        s * Y,
        s * Z,
    ]


def kraus_for(kind: str, strength: float) -> list[np.ndarray]:
    if kind == "phase_shift":
        return phase_shift(strength)
    if kind == "phase_damping":
        return phase_damping(strength)
    if kind == "amplitude_damping":
        return amplitude_damping(strength)
    if kind == "depolarizing":
        return depolarizing(strength)
    raise ValueError(f"unknown channel kind {kind!r}")
