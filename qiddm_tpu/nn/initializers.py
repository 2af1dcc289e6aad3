"""Parameter initializers matching the reference's torch defaults.

The reference initializes quantum weights as ``torch.randn(shape) * 0.4``
(nn/qdense.py:30-32 etc.) and relies on torch's default Linear/Conv init
(``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for both kernel and bias). Training
dynamics parity depends on these, so we reproduce them rather than using flax
defaults.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def qweight_init(stddev: float = 0.4):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


def torch_uniform(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def qconv_uniform():
    """QConv2d weight init: ``U[0,1) * pi - pi/2`` (reference nn/qconv.py:36-38)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype) * jnp.pi - jnp.pi / 2

    return init
