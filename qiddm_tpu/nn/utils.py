"""NN utilities: crop/pad alignment and label embeddings.

Reference: nn/utils.py (autocrop:7, autopad:22, sinusoidal label
embedding:42-55, binary-split embedding:58-71). The QASM bridge that lived
here moves to ``qiddm_tpu.sim.qasm``.
"""

from __future__ import annotations

import math
import warnings

import jax.numpy as jnp


def autocrop(x, y):
    """Center-crop y to x's spatial size (reference nn/utils.py:7-19)."""
    xs, ys = x.shape, y.shape
    if xs > ys:
        warnings.warn("x is larger than y. Cropping x to match y")
        return autocrop(y, x)
    y_cropped = y[
        :, :,
        (ys[2] - xs[2]) // 2: (ys[2] + xs[2]) // 2,
        (ys[3] - xs[3]) // 2: (ys[3] + xs[3]) // 2,
    ]
    return x, y_cropped


def autopad(x, y):
    """Zero-pad y to x's spatial size (reference nn/utils.py:22-39)."""
    xs, ys = x.shape, y.shape
    if xs < ys:
        warnings.warn("x is smaller than y. Padding x to match y")
        return autopad(y, x)
    ph, pw = xs[2] - ys[2], xs[3] - ys[3]
    y_padded = jnp.pad(
        y,
        ((0, 0), (0, 0),
         (math.ceil(ph / 2), math.floor(ph / 2)),
         (math.ceil(pw / 2), math.floor(pw / 2))),
    )
    return x, y_padded


def _get_label_embedding_1(labels, width: int, height: int):
    """Sinusoidal label mask ``0.1*sin(label + arange(width)/20)`` broadcast
    to (b, 1, width, height) (reference nn/utils.py:42-55)."""
    labels = jnp.asarray(labels, jnp.float32)
    batch = labels.shape[0]
    ramp = jnp.arange(width, dtype=jnp.float32) / 20.0
    mask = 0.1 * jnp.sin(labels[:, None] + ramp[None, :])  # (b, w)
    return jnp.broadcast_to(mask[:, None, :, None], (batch, 1, width, height))


def _get_label_embedding_2(labels, width: int, height: int):
    """Binary half-split mask (reference nn/utils.py:58-71)."""
    labels = jnp.asarray(labels)
    batch = labels.shape[0]
    is0 = (labels == 0).astype(jnp.float32).reshape(batch, 1, 1, 1) * 0.1
    is1 = (labels == 1).astype(jnp.float32).reshape(batch, 1, 1, 1) * 0.1
    top = jnp.broadcast_to(is0, (batch, 1, width // 2, height))
    bottom = jnp.broadcast_to(is1, (batch, 1, width - width // 2, height))
    return jnp.concatenate([top, bottom], axis=2)


get_label_embedding = _get_label_embedding_1


# --- QASM bridge (reference nn/utils.py:77-129 keeps these here) -----------

def circuit_to_qasm(weights, wires, inp):
    from ..sim import qasm

    return qasm.circuit_to_qasm(weights, wires, inp)


def repeat_qasm(qasm_str, wires, ancilla, reps):
    from ..sim import qasm

    return qasm.repeat_qasm(qasm_str, wires, ancilla, reps)


def sample_from_qiskit(qasm_str, backend="statevector_simulator", shots=None):
    """Name kept for parity with reference nn/utils.py:114; executes on the
    framework's native engine instead of qiskit-aer."""
    from ..sim import qasm

    return qasm.sample_from_qasm(qasm_str, shots=shots)
