"""UNet denoisers with quantum-or-classical convolutions.

Reference: nn/unet.py — ``Conv2d`` dispatches on qdepth (>0 -> QConv2d,
0 -> classical conv, :9-24); ``DownBlock`` = [Conv->BN->ReLU]x2 (+MaxPool,
:78-116); ``UpBlock`` = bilinear x2 upsample + 1x1 conv, autopad-concat skip,
[Conv->ReLU->BN->Conv->BN->ReLU] (:28-75); ``UNetUndirected(depth=3,
start_channels=8, qdepth=3)`` with channel doubling and a final 1x1 conv
(:119-180); ``UnetDirected`` adds the sinusoidal label mask (:183-190).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchConv
from .qconv import QConv2d
from .shim import DenoiserShim
from .utils import autopad, get_label_embedding


def Conv2d(*, in_channels, out_channels, kernel_size, padding, qdepth=3,
           name=None):
    """Quantum/classical conv dispatcher (reference nn/unet.py:9-24)."""
    ks = kernel_size if isinstance(kernel_size, tuple) \
        else (kernel_size, kernel_size)
    pd = padding if isinstance(padding, tuple) else (padding, padding)
    if qdepth > 0:
        return QConv2d(in_channels=in_channels, out_channels=out_channels,
                       kernel_size=ks, padding=pd, qdepth=qdepth, name=name)
    return TorchConv(features=out_channels, kernel_size=ks, padding=pd,
                     name=name)


def _call_conv(conv, x, train):
    if isinstance(conv, QConv2d):
        return conv(x, train=train)
    return conv(x)


class DownBlock(nn.Module):
    """[Conv->BN->ReLU]x2 with optional 2x2 max-pool; returns (pooled, skip)."""

    in_channels: int
    out_channels: int
    pooling: bool
    kernel_size: int = 3
    qdepth: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            conv = Conv2d(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                kernel_size=self.kernel_size, padding=1,
                qdepth=self.qdepth, name=f"conv{i}")
            x = _call_conv(conv, x, train)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis=1, name=f"bn{i}")(x)
            x = nn.relu(x)
        before_pool = x
        if self.pooling:
            x = jnp.transpose(
                nn.max_pool(jnp.transpose(x, (0, 2, 3, 1)),
                            (2, 2), strides=(2, 2)), (0, 3, 1, 2))
        return x, before_pool


class UpBlock(nn.Module):
    """Bilinear x2 upsample + 1x1 conv; autopad skip; conv stack."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    qdepth: int = 3

    @nn.compact
    def __call__(self, from_down, from_up, train: bool = False):
        b, c, h, w = from_up.shape
        up = jax.image.resize(from_up, (b, c, h * 2, w * 2), method="bilinear")
        up = _call_conv(
            Conv2d(in_channels=self.in_channels,
                   out_channels=self.out_channels, kernel_size=1, padding=0,
                   qdepth=self.qdepth, name="up_conv"), up, train)
        from_down, up = autopad(from_down, up)
        x = jnp.concatenate([up, from_down], axis=1)
        # reference nn/unet.py:49-68: Conv -> ReLU -> BN -> Conv -> BN -> ReLU
        x = _call_conv(
            Conv2d(in_channels=2 * self.out_channels,
                   out_channels=self.out_channels,
                   kernel_size=self.kernel_size, padding=1,
                   qdepth=self.qdepth, name="conv0"), x, train)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis=1, name="bn0")(x)
        x = _call_conv(
            Conv2d(in_channels=self.out_channels,
                   out_channels=self.out_channels,
                   kernel_size=self.kernel_size, padding=1,
                   qdepth=self.qdepth, name="conv1"), x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis=1, name="bn1")(x)
        return nn.relu(x)


class UNetModule(nn.Module):
    """UNetUndirected as a flax module (reference nn/unet.py:119-180)."""

    depth: int = 3
    start_channels: int = 8
    qdepth: int = 3
    directed: bool = False
    simple: bool = False  # unet_simple variant (single-QConv blocks)

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        if self.directed:
            mask = get_label_embedding(y, x.shape[2], x.shape[3])
            x = x + mask
        assert self.depth > 0, "Depth must be greater than 0"
        blocks = []
        out_channel = -1
        for i in range(self.depth):
            in_channel = 1 if i == 0 else out_channel
            out_channel = self.start_channels * 2**i
            blocks.append((in_channel, out_channel, i < self.depth - 1))

        encoder_outputs = []
        h = x
        for i, (cin, cout, pooling) in enumerate(blocks):
            if self.simple:
                h, before = SimpleDownBlock(
                    in_channels=cin, out_channels=cout, pooling=pooling,
                    qdepth=self.qdepth, name=f"down{i}")(h, train=train)
            else:
                h, before = DownBlock(
                    in_channels=cin, out_channels=cout, pooling=pooling,
                    qdepth=self.qdepth, name=f"down{i}")(h, train=train)
            encoder_outputs.append(before)

        for i in range(self.depth - 1):
            cin = out_channel
            out_channel = out_channel // 2
            skip = encoder_outputs[-(i + 2)]
            if self.simple:
                h = SimpleUpBlock(in_channels=cin, out_channels=out_channel,
                                  qdepth=self.qdepth,
                                  name=f"up{i}")(skip, h, train=train)
            else:
                h = UpBlock(in_channels=cin, out_channels=out_channel,
                            qdepth=self.qdepth,
                            name=f"up{i}")(skip, h, train=train)

        h = _call_conv(
            Conv2d(in_channels=out_channel, out_channels=1, kernel_size=1,
                   padding=0, qdepth=self.qdepth, name="final_conv"),
            h, train)
        return h


class SimpleDownBlock(nn.Module):
    """unet_simple DownBlockS: single QConv + BN (reference nn/unet_simple.py:6-18)."""

    in_channels: int
    out_channels: int
    pooling: bool
    kernel_size: int = 3
    qdepth: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = QConv2d(in_channels=self.in_channels,
                    out_channels=self.out_channels,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    padding=(1, 1), qdepth=self.qdepth, name="qconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis=1, name="bn")(x)
        before_pool = x
        if self.pooling:
            x = jnp.transpose(
                nn.max_pool(jnp.transpose(x, (0, 2, 3, 1)),
                            (2, 2), strides=(2, 2)), (0, 3, 1, 2))
        return x, before_pool


class SimpleUpBlock(nn.Module):
    """unet_simple UpBlockS (reference nn/unet_simple.py:21-49)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    qdepth: int = 3

    @nn.compact
    def __call__(self, from_down, from_up, train: bool = False):
        b, c, h, w = from_up.shape
        up = jax.image.resize(from_up, (b, c, h * 2, w * 2), method="bilinear")
        up = QConv2d(in_channels=self.in_channels,
                     out_channels=self.out_channels, kernel_size=(1, 1),
                     padding=(0, 0), qdepth=self.qdepth, name="up_qconv")(up)
        from_down, up = autopad(from_down, up)
        x = jnp.concatenate([up, from_down], axis=1)
        x = QConv2d(in_channels=2 * self.out_channels,
                    out_channels=self.out_channels,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    padding=(1, 1), qdepth=self.qdepth, name="qconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis=1, name="bn")(x)
        return x


# ---------------------------------------------------------------------------
# public shims
# ---------------------------------------------------------------------------

class UNetUndirected(DenoiserShim):
    """Reference nn/unet.py:119-180."""

    def __init__(self, depth=3, start_channels=8, qdepth=3, seed: int = 0,
                 img_shape=(28, 28)):
        depth, start_channels, qdepth = (int(depth), int(start_channels),
                                         int(qdepth))
        self.depth, self.start_channels, self.qdepth = (depth, start_channels,
                                                        qdepth)
        super().__init__(
            UNetModule(depth=depth, start_channels=start_channels,
                       qdepth=qdepth),
            img_shape, seed=seed,
            save_name_str=f"unet_undirected_d{depth}_s{start_channels}_d{qdepth}",
        )


class UnetDirected(DenoiserShim):
    """Reference nn/unet.py:183-190."""

    _simple = False
    _name_prefix = "unet_directed"

    def __init__(self, depth=3, start_channels=8, qdepth=3, seed: int = 0,
                 img_shape=(28, 28)):
        import numpy as _np

        depth, start_channels, qdepth = (int(depth), int(start_channels),
                                         int(qdepth))
        self.depth, self.start_channels, self.qdepth = (depth, start_channels,
                                                        qdepth)
        self.module = UNetModule(depth=depth, start_channels=start_channels,
                                 qdepth=qdepth, directed=True,
                                 simple=self._simple)
        self.img_shape = img_shape
        self._save_name = (f"{self._name_prefix}_d{depth}"
                           f"_s{start_channels}_d{qdepth}")
        self.directed = True
        w, h = img_shape
        dummy_x = jax.random.uniform(jax.random.PRNGKey(seed + 1),
                                     (2, 1, w, h))
        dummy_y = _np.zeros((2,), _np.int32)
        self.variables = jax.jit(
            lambda k, xb, yb: self.module.init(k, xb, yb, train=False))(
                jax.random.PRNGKey(seed), dummy_x, dummy_y)

    def __call__(self, x, y=None, train: bool = False):
        import numpy as _np

        out = self._jitted_apply_directed(train)(
            self.variables, jnp.asarray(x), _np.asarray(y))
        return self._fold_mutable(out, train)


class UNetUndirectedS(DenoiserShim):
    """Reference nn/unet_simple.py:52-84."""

    def __init__(self, depth=3, start_channels=8, qdepth=3, seed: int = 0,
                 img_shape=(28, 28)):
        depth, start_channels, qdepth = (int(depth), int(start_channels),
                                         int(qdepth))
        self.depth, self.start_channels, self.qdepth = (depth, start_channels,
                                                        qdepth)
        super().__init__(
            UNetModule(depth=depth, start_channels=start_channels,
                       qdepth=qdepth, simple=True),
            img_shape, seed=seed,
            save_name_str=(f"unet_s_undirected_d{depth}"
                           f"_s{start_channels}_d{qdepth}"),
        )


class UnetDirectedS(UnetDirected):
    """Reference nn/unet_simple.py:87-94."""

    _simple = True
    _name_prefix = "unet_s_directed"
