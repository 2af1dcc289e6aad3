"""Parameter-shift gradients, vectorized.

The reference differentiates most of its circuits with PennyLane's
``diff_method="parameter-shift"`` (e.g. nn/qdense.py:1296): two extra circuit
executions per trainable parameter, run SEQUENTIALLY per sample. On a
simulator this is strictly worse than backprop (which is exact), so the
framework trains with autodiff — this module exists for parity/validation
and as a hardware-realistic gradient path.

TPU-native formulation: ALL 2P shifted circuits evaluate in one vmapped
program (P = parameter count), instead of 2P sequential executions.

Validity: the two-term rule ``df/dt = (f(t + pi/2) - f(t - pi/2)) / 2``
holds for expectation values of circuits whose parameters enter through
single-qubit rotations with eigenvalues +-1/2 (RZ/RY/RX and each Rot angle)
— exactly the reference's ansatz. It applies to the raw circuit output
(expvals or probs, which are projector expectations), not to nonlinear
post-processing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def parameter_shift_grad(circuit_fn, weights, chunk: int = 0):
    """Gradient of ``circuit_fn(weights) -> scalar`` by parameter shift.

    weights: any-shaped angle tensor entering via rotations. ``chunk`` > 0
    evaluates the 2P shifted circuits in chunks (memory control).
    Returns an array shaped like ``weights``.
    """
    flat = weights.ravel()
    P = flat.size
    shift = 0.5 * jnp.pi
    eye = jnp.eye(P, dtype=flat.dtype) * shift
    plus = (flat[None, :] + eye).reshape((P,) + weights.shape)
    minus = (flat[None, :] - eye).reshape((P,) + weights.shape)
    both = jnp.concatenate([plus, minus], axis=0)  # (2P, ...)

    def eval_one(w):
        return circuit_fn(w)

    if chunk and chunk < 2 * P:
        total = 2 * P
        pad = (-total) % chunk
        if pad:
            both = jnp.concatenate(
                [both, jnp.broadcast_to(both[-1:],
                                        (pad,) + weights.shape)], axis=0)
        outs = jax.lax.map(jax.vmap(eval_one),
                           both.reshape(-1, chunk, *weights.shape))
        outs = outs.reshape(-1)[:total]
    else:
        outs = jax.vmap(eval_one)(both)
    grads = (outs[:P] - outs[P:]) / 2.0
    return grads.reshape(weights.shape)
