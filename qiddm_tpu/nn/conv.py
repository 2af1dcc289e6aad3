"""Classical deep-CNN baselines (reference nn/conv.py)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import TorchConv
from .shim import DenoiserShim
from .utils import get_label_embedding


class _DeepConvModule(nn.Module):
    """[Conv3x3 -> ReLU]* with a final Sigmoid (reference nn/conv.py:7-31).

    mode: 'undirected' (plain), 'multi' (label channel concatenated before
    every conv, last ReLU replaced by Sigmoid, nn/conv.py:40-68), 'single'
    (sinusoidal label mask added to the input, nn/conv.py:77-83).
    """

    channels: Tuple[int, ...]
    mode: str = "undirected"
    shape: Tuple[int, int] = (28, 28)

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        assert x.ndim == 4, "Input must be 4D tensor"
        chans = self.channels
        if self.mode == "single":
            mask = get_label_embedding(jnp.asarray(y).reshape(-1),
                                       self.shape[0], self.shape[1])
            x = x + mask
        if self.mode == "multi":
            yc = jnp.broadcast_to(
                jnp.asarray(y, x.dtype).reshape(-1, 1, 1, 1),
                (x.shape[0], 1, x.shape[2], x.shape[3]))
        n = len(chans) - 1
        for i in range(n):
            if self.mode == "multi":
                x = jnp.concatenate([x, yc], axis=1)
            x = TorchConv(features=chans[i + 1], kernel_size=(3, 3),
                          padding=(1, 1), name=f"conv{i}")(x)
            last = i == n - 1
            if self.mode == "multi":
                # reference replaces the final ReLU with Sigmoid (:58)
                x = jax.nn.sigmoid(x) if last else nn.relu(x)
            else:
                x = nn.relu(x)
        if self.mode != "multi":
            x = jax.nn.sigmoid(x)  # appended Sigmoid (:25)
        return x


class DeepConvUndirected(DenoiserShim):
    """Reference nn/conv.py:7-37."""

    def __init__(self, channels, shape, seed: int = 0):
        channels = tuple(int(c) for c in channels)
        shape = tuple(shape) if not isinstance(shape, int) else (shape, shape)
        assert channels[0] == channels[-1], \
            "Input and output channels must be equal"
        self.channels = channels
        super().__init__(
            _DeepConvModule(channels=channels, shape=shape),
            shape, seed=seed,
            save_name_str=("deep_conv_undirected_"
                           + "_".join(map(str, channels))),
        )


class _DirectedConvShim(DenoiserShim):
    def __init__(self, module, shape, save, seed):
        self.module = module
        self.img_shape = shape
        self._save_name = save
        self.directed = True
        w, h = shape
        dummy_x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (2, 1, w, h))
        dummy_y = np.zeros((2,), np.int32)
        self.variables = jax.jit(
            lambda k, xb, yb: module.init(k, xb, yb, train=False))(
                jax.random.PRNGKey(seed), dummy_x, dummy_y)

    def __call__(self, x, y=None, train: bool = False):
        out = self._jitted_apply_directed(train)(
            self.variables, jnp.asarray(x), np.asarray(y))
        return self._fold_mutable(out, train)


class DeepConvDirectedMulti(_DirectedConvShim):
    """Reference nn/conv.py:40-74."""

    def __init__(self, channels, shape=(28, 28), seed: int = 0):
        channels = tuple(int(c) for c in channels)
        assert channels[0] == channels[-1], \
            "Input and output channels must be equal"
        self.channels = channels
        shape = tuple(shape) if not isinstance(shape, int) else (shape, shape)
        super().__init__(
            _DeepConvModule(channels=channels, mode="multi", shape=shape),
            shape,
            "deep_conv_directed_multi_" + "_".join(map(str, channels)), seed)


class DeepConvDirectedSingle(_DirectedConvShim):
    """Reference nn/conv.py:77-89."""

    def __init__(self, channels, shape, seed: int = 0):
        channels = tuple(int(c) for c in channels)
        assert channels[0] == channels[-1], \
            "Input and output channels must be equal"
        self.channels = channels
        shape = tuple(shape) if not isinstance(shape, int) else (shape, shape)
        super().__init__(
            _DeepConvModule(channels=channels, mode="single", shape=shape),
            shape,
            "deep_conv_directed_single_" + "_".join(map(str, channels)), seed)
