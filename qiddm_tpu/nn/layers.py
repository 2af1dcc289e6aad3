"""Shared building blocks: torch-initialized Dense/Conv, probability
post-processing, image flatten/unflatten helpers."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import torch_uniform


class TorchDense(nn.Module):
    """Dense layer with torch's default ``U(+-1/sqrt(fan_in))`` init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_uniform(fan_in), (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_uniform(fan_in), (self.features,))
            y = y + bias
        return y


class TorchConv(nn.Module):
    """2-D convolution on NCHW images with torch's default init.

    Operates in NHWC internally (TPU-friendly layout); the module boundary
    stays NCHW for parity with the reference's tensors.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: tuple = (1, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # x: (b, c, h, w)
        c_in = x.shape[1]
        kh, kw = self.kernel_size
        fan_in = c_in * kh * kw
        y = jnp.transpose(x, (0, 2, 3, 1))
        y = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            use_bias=self.use_bias,
            kernel_init=torch_uniform(fan_in),
            bias_init=torch_uniform(fan_in),
        )(y)
        return jnp.transpose(y, (0, 3, 1, 2))


def flatten_img(x):
    """(b, 1, w, h) -> (b, w*h)."""
    return x.reshape(x.shape[0], -1)


def unflatten_img(x, width: int, height: int):
    return x.reshape(x.shape[0], 1, width, height)


def postprocess_probs(probs, pixels: int):
    """Truncate to the pixel count, rescale, clamp — the reference's
    ``_post_process`` (nn/qdense.py:49-54, :443-448)."""
    p = probs[..., :pixels] * pixels
    return jnp.clip(p, 0.0, 1.0)
