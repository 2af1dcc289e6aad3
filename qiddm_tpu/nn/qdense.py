"""The reference's full dense quantum model zoo, by public name.

Every class here mirrors a reference class from nn/qdense.py (byte-identical
to nn/dense.py in the release, SURVEY §8.1) with the same constructor
signature and ``save_name()`` string, mapped onto the four flax families in
``core.py``. ``QIDDM_L`` — imported by the reference drivers but missing from
the release (SURVEY §8.3) — is provided as the linear-down/linear-up variant.
"""

from __future__ import annotations

import ast
import math
import operator as _op

from .core import QDense as _QDenseModule
from .core import QNNA as _QNNAModule
from .core import QNNDense as _QNNDenseModule
from .core import Reupload as _ReuploadModule
from .shim import DenoiserShim, _square_or_flat

_ALLOWED_OPS = {
    ast.Add: _op.add, ast.Sub: _op.sub, ast.Mult: _op.mul,
    ast.FloorDiv: _op.floordiv, ast.Pow: _op.pow,
}


def _int_arg(v) -> int:
    """Parse int args that may arrive as arithmetic strings like "28 * 28"
    (the reference evals these, nn/qdense.py:222-223; we parse safely)."""
    if isinstance(v, int):
        return v
    if isinstance(v, str):
        node = ast.parse(v.strip(), mode="eval").body

        def ev(n):
            if isinstance(n, ast.Constant) and isinstance(n.value, int):
                return n.value
            if isinstance(n, ast.BinOp) and type(n.op) in _ALLOWED_OPS:
                return _ALLOWED_OPS[type(n.op)](ev(n.left), ev(n.right))
            raise ValueError(f"cannot parse int expression {v!r}")

        return ev(node)
    return int(v)


def _shape_arg(shape):
    if isinstance(shape, (int, str)):
        s = _int_arg(shape)
        return (s, s)
    return tuple(shape)


# ---------------------------------------------------------------------------
# Qdense family
# ---------------------------------------------------------------------------

class QDenseUndirected_old(DenoiserShim):
    """Reference nn/qdense.py:15-68."""

    def __init__(self, qdepth, shape, seed: int = 0, init_batch=None):
        qdepth = _int_arg(qdepth)
        shape = _shape_arg(shape)
        self.qdepth, (self.width, self.height) = qdepth, shape
        self.wires = math.ceil(math.log2(shape[0] * shape[1]))
        super().__init__(
            _QDenseModule(qdepth=qdepth, shape=shape, weight_map="qw_tanh"),
            shape, seed=seed,
            save_name_str=f"QDenseUndirected_old{qdepth}_w{shape[0]}_h{shape[1]}",
        )


class QDenseUndirected_old_noise(DenoiserShim):
    """Reference nn/qdense.py:71-125 (the papers' "Qdense" baseline)."""

    def __init__(self, qdepth, shape, add_noise=0,
                 device_type="default.qubit.torch", seed: int = 0, init_batch=None):
        qdepth, add_noise = _int_arg(qdepth), _int_arg(add_noise)
        shape = _shape_arg(shape)
        self.qdepth, self.add_noise = qdepth, add_noise
        self.width, self.height = shape
        self.wires = math.ceil(math.log2(shape[0] * shape[1]))
        super().__init__(
            _QDenseModule(qdepth=qdepth, shape=shape, weight_map="tanh",
                          add_noise=add_noise),
            shape, seed=seed,
            save_name_str=(f"QDenseUndirected_old_noise{qdepth}"
                           f"_w{shape[0]}_h{shape[1]}_noise{add_noise}"),
        )


class QNN_A(DenoiserShim):
    """Reference nn/qdense.py:128-210."""

    def __init__(self, qdepth, shape, add_noise=0,
                 device_type="default.qubit.torch", diff_method="backprop",
                 seed: int = 0, init_batch=None):
        qdepth, add_noise = _int_arg(qdepth), _int_arg(add_noise)
        shape = _shape_arg(shape)
        self.qdepth, self.add_noise = qdepth, add_noise
        self.width, self.height = shape
        super().__init__(
            _QNNAModule(qdepth=qdepth, shape=shape, add_noise=add_noise),
            shape, seed=seed,
            save_name_str=(f"QNN_A{qdepth}_w{shape[0]}_h{shape[1]}"
                           f"_noise{add_noise}"),
        )


class QNN_noise(DenoiserShim):
    """Reference nn/qdense.py:219-307."""

    def __init__(self, input_dim, hidden_features, qdepth, add_noise=0,
                 seed: int = 0, init_batch=None):
        input_dim, hidden_features = _int_arg(input_dim), _int_arg(hidden_features)
        qdepth, add_noise = _int_arg(qdepth), _int_arg(add_noise)
        self.hidden_features, self.qdepth = hidden_features, qdepth
        self.add_noise = add_noise
        super().__init__(
            _QNNDenseModule(input_dim=input_dim, hidden_features=hidden_features,
                            qdepth=qdepth, add_noise=add_noise),
            _square_or_flat(input_dim), seed=seed,
            save_name_str=(f"QNN_linear_features={hidden_features}"
                           f"_qdepth={qdepth}_add_noise={add_noise}"),
        )


class QNN(DenoiserShim):
    """Reference nn/qdense.py:310-386."""

    def __init__(self, input_dim, hidden_features, qdepth, seed: int = 0, init_batch=None):
        input_dim, hidden_features = _int_arg(input_dim), _int_arg(hidden_features)
        qdepth = _int_arg(qdepth)
        self.hidden_features, self.qdepth = hidden_features, qdepth
        super().__init__(
            _QNNDenseModule(input_dim=input_dim, hidden_features=hidden_features,
                            qdepth=qdepth),
            _square_or_flat(input_dim), seed=seed,
            save_name_str=(f"QNN_linear_features={hidden_features}"
                           f"_qdepth={qdepth}"),
        )


# ---------------------------------------------------------------------------
# differN (QIDDM-A) family — PCA/conv down, probs readout
# ---------------------------------------------------------------------------

def _wires_for(pixels: int) -> int:
    return math.ceil(math.log2(pixels))


class _ReuploadShim(DenoiserShim):
    def __init__(self, module, shape, save_name_str, seed=0, init_batch=None,
                 **attrs):
        for k, v in attrs.items():
            setattr(self, k, v)
        super().__init__(module, shape, seed=seed,
                         save_name_str=save_name_str, init_batch=init_batch)


class differN_noise(_ReuploadShim):
    """Reference nn/qdense.py:389-478 (papers' "QIDDM-A" flagship)."""

    def __init__(self, shape, spectrum_layer, N, add_noise=0, seed: int = 0, init_batch=None):
        shape = _shape_arg(shape)
        L, N, add_noise = _int_arg(spectrum_layer), _int_arg(N), _int_arg(add_noise)
        wires = _wires_for(shape[0] * shape[1])
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="pca",
                            up="none", readout="probs",
                            add_noise=add_noise, noise_family="qdense"),
            shape,
            f"differN_old_pca={L}_N={N}_w{shape[0]}_h{shape[1]}_noise{add_noise}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, add_noise=add_noise, wires=wires,
        )


class differN_noise_befor(_ReuploadShim):
    """Reference nn/qdense.py:481-562 (noise inside the re-upload loop;
    save_name matches the tune_results checkpoints)."""

    def __init__(self, shape, spectrum_layer, N, add_noise=0,
                 device_type="default.qubit.torch", seed: int = 0, init_batch=None):
        shape = _shape_arg(shape)
        L, N, add_noise = _int_arg(spectrum_layer), _int_arg(N), _int_arg(add_noise)
        wires = _wires_for(shape[0] * shape[1])
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="pca",
                            up="none", readout="probs", add_noise=add_noise,
                            noise_family="differn_befor"),
            shape, f"differN_noise={L}_N={N}_w{shape[0]}_h{shape[1]}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, add_noise=add_noise, wires=wires,
        )


class differN_old_pca(_ReuploadShim):
    """Reference nn/qdense.py:671-743."""

    def __init__(self, shape, spectrum_layer, N, seed: int = 0, init_batch=None):
        shape = _shape_arg(shape)
        L, N = _int_arg(spectrum_layer), _int_arg(N)
        wires = _wires_for(shape[0] * shape[1])
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="pca",
                            up="none", readout="probs"),
            shape, f"differN_old_pca={L}_N={N}_w{shape[0]}_h{shape[1]}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, wires=wires,
        )


class differN_new_pca(_ReuploadShim):
    """Reference nn/qdense.py:747-835 (post-processes probs per block)."""

    def __init__(self, shape, spectrum_layer, N, seed: int = 0, init_batch=None):
        shape = _shape_arg(shape)
        L, N = _int_arg(spectrum_layer), _int_arg(N)
        wires = _wires_for(shape[0] * shape[1])
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="pca",
                            up="none", readout="probs", post_each_block=True),
            shape, f"differN_new_pca={L}_N={N}_w{shape[0]}_h{shape[1]}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, wires=wires,
        )


class differN_new_conv(_ReuploadShim):
    """Reference nn/qdense.py:838-935."""

    def __init__(self, shape, spectrum_layer, N, seed: int = 0, init_batch=None):
        shape = _shape_arg(shape)
        L, N = _int_arg(spectrum_layer), _int_arg(N)
        wires = _wires_for(shape[0] * shape[1])
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="conv",
                            up="none", readout="probs", post_each_block=True),
            shape, f"differN_new_conv={L}_N={N}_w{shape[0]}_h{shape[1]}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, wires=wires,
        )


class differN_old_conv(_ReuploadShim):
    """Reference nn/qdense.py:939-1011."""

    def __init__(self, shape, spectrum_layer, N, seed: int = 0, init_batch=None):
        shape = _shape_arg(shape)
        L, N = _int_arg(spectrum_layer), _int_arg(N)
        wires = _wires_for(shape[0] * shape[1])
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="conv",
                            up="none", readout="probs"),
            shape, f"differN_old_conv={L}_N={N}_w{shape[0]}_h{shape[1]}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, wires=wires,
        )


class QIDDM_A_sameN(_ReuploadShim):
    """Reference nn/qdense.py:2276-2342 (no projection, shared block weights)."""

    def __init__(self, shape, spectrum_layer, N, seed: int = 0, init_batch=None):
        shape = _shape_arg(shape)
        L, N = _int_arg(spectrum_layer), _int_arg(N)
        wires = _wires_for(shape[0] * shape[1])
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="none",
                            up="none", readout="probs", shared_weights=True),
            shape, f"QIDDM_A_sameN={L}_N={N}_w{shape[0]}_h{shape[1]}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, wires=wires,
        )


class QIDDM_A_differN_basePL(_ReuploadShim):
    """Reference nn/qdense.py:2182-2273 (pi/2-scaled RZ encode, per-block
    post-processing; ``input_dim`` is the image SIDE, not the pixel count)."""

    def __init__(self, input_dim, spectrum_layer, N, seed: int = 0, init_batch=None):
        side = _int_arg(input_dim)
        shape = (side, side)
        L, N = _int_arg(spectrum_layer), _int_arg(N)
        wires = _wires_for(side * side)
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="pca",
                            up="none", readout="probs", encode="rz_halfpi",
                            post_each_block=True),
            shape, f"QIDDM_pca_features={wires}_L={L}_N={N}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, hidden_features=wires,
        )


class QIDDM_A_differN_NEW(_ReuploadShim):
    """Reference nn/qdense.py:2345-2437 (same circuit as basePL)."""

    def __init__(self, input_dim, spectrum_layer, N, seed: int = 0, init_batch=None):
        side = _int_arg(input_dim)
        shape = (side, side)
        L, N = _int_arg(spectrum_layer), _int_arg(N)
        wires = _wires_for(side * side)
        super().__init__(
            _ReuploadModule(hidden=wires, L=L, N=N, shape=shape, down="pca",
                            up="none", readout="probs", encode="rz_halfpi",
                            post_each_block=True),
            shape, f"QIDDM_pca_new={wires}_L={L}_N={N}",
            seed=seed, init_batch=init_batch, spectrum_layer=L, N=N, hidden_features=wires,
        )


# ---------------------------------------------------------------------------
# QIDDM-L family — expval readout, linear/PCA/conv projections
# ---------------------------------------------------------------------------

def _qiddm(input_dim, hidden, L, N, *, down, up, save, encode="rz", k=2,
           add_noise=0, bias=True, batchnorm=False, pca_lazy=False,
           seed=0, noise_intensity=None):
    input_dim, hidden = _int_arg(input_dim), _int_arg(hidden)
    L, N = _int_arg(L), _int_arg(N)
    module = _ReuploadModule(
        hidden=hidden, L=L, N=N, input_dim=input_dim, k=k, down=down, up=up,
        readout="expvalz", encode=encode, add_noise=_int_arg(add_noise),
        noise_family="qiddm", bias=bias, batchnorm_pre_block=batchnorm,
        pca_lazy=pca_lazy, noise_intensity=noise_intensity,
    )
    return module, _square_or_flat(input_dim), save.format(
        h=hidden, L=L, N=N), dict(hidden_features=hidden, spectrum_layer=L, N=N)


class QIDDM_PL(_ReuploadShim):
    """Reference nn/qdense.py:1271-1368 (papers' "QIDDM-L" flagship:
    PCA down, linear up, PauliZ readout)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="pca",
                                       up="linear",
                                       save="QIDDM_PL={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)


class QIDDM_PL_old(_ReuploadShim):
    """Reference nn/qdense.py:1176-1250."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="pca",
                                       up="linear",
                                       save="QIDDM_PL_old_q={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)


class QIDDM_PL_noise(_ReuploadShim):
    """Reference nn/qdense.py:1371-1466."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 add_noise=0, device_type="lightning.qubit", seed: int = 0,
                 noise_intensity=None, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="pca",
                                       up="linear", add_noise=add_noise,
                                       noise_intensity=noise_intensity,
                                       save="QIDDM_PL_noise={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch,
                         add_noise=_int_arg(add_noise), **attrs)


class QIDDM_PL_noise1(_ReuploadShim):
    """Reference nn/qdense.py:565-667 (RY re-uploading variant).

    Faithful quirk: the reference gives this class the SAME ``save_name``
    format as ``QIDDM_PL_noise`` (both return ``QIDDM_PL_noise=...``,
    reference :646 vs :1466), so checkpoints of the two architecturally
    different circuits (RY vs RZ encode) collide on disk. Kept for
    artifact parity; use distinct save paths when training both.
    """

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 add_noise=0, device_type="lightning.qubit", seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="pca",
                                       up="linear", encode="ry",
                                       add_noise=add_noise,
                                       save="QIDDM_PL_noise={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch,
                         add_noise=_int_arg(add_noise), **attrs)


class QIDDM_LL_noise(_ReuploadShim):
    """Reference nn/qdense.py:1567-1660 (default model of the mnist driver
    and the Ray sweep)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 add_noise=0, device_type="lightning.qubit", seed: int = 0,
                 noise_intensity=None, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="linear",
                                       up="linear", add_noise=add_noise,
                                       noise_intensity=noise_intensity,
                                       save="QIDDM_LL_noise={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch,
                         add_noise=_int_arg(add_noise), **attrs)


class QIDDM_LL_relu_noise(_ReuploadShim):
    """Reference nn/qdense.py:1469-1564 (ReLU instantiated but never applied
    — reproduced as plain LL)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 add_noise=0, device_type="lightning.qubit", seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="linear",
                                       up="linear", add_noise=add_noise,
                                       save="QIDDM_LL_noise={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch,
                         add_noise=_int_arg(add_noise), **attrs)


class QIDDM_LL_old(_ReuploadShim):
    """Reference nn/qdense.py:1873-1968."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="linear",
                                       up="linear",
                                       save="QIDDM_linear_features={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)


class QIDDM_L(QIDDM_LL_old):
    """Missing from the reference release though imported by its drivers
    (src/fashion_exm.py:24; SURVEY §8.3) — provided as the linear-down /
    linear-up QIDDM variant."""


class QIDDM_bias_false(_ReuploadShim):
    """Reference nn/qdense.py:1971-2074 (bias-free linears, k=3 SEL layers)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="linear",
                                       up="linear", bias=False, k=3,
                                       save="QIDDM_linear_features={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)


class QIDDM_L_B(_ReuploadShim):
    """Reference nn/qdense.py:2077-2179 (BatchNorm before each block, k=3;
    the reference's only JAX-device model)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="linear",
                                       up="linear", k=3, batchnorm=True,
                                       save="QIDDM_linear_batch_features={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)


class QIDDM_CL_new(_ReuploadShim):
    """Reference nn/qdense.py:1014-1100 (conv down, linear up)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="conv",
                                       up="linear",
                                       save="QIDDM_CL_new_q={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)


class QIDDM_CL_old(_ReuploadShim):
    """Reference nn/qdense.py:1104-1173."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="conv",
                                       up="linear",
                                       save="QIDDM_CL_old_q={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)


class QIDDM_PP_noise(_ReuploadShim):
    """Reference nn/qdense.py:1663-1753 (PCA down + inverse-PCA up)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 add_noise=0, device_type="lightning.qubit", seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N, down="pca",
                                       up="pca_inverse", add_noise=add_noise,
                                       save="QIDDM_PP_noise={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch,
                         add_noise=_int_arg(add_noise), **attrs)


class QIDDM_PP_old(_ReuploadShim):
    """Reference nn/qdense.py:1756-1870 (lazily-fitted PCA(2h) -> BatchNorm
    -> Linear(h) down; Linear(2h) -> inverse PCA up; PCA pickled into the
    checkpoint)."""

    def __init__(self, input_dim, hidden_features, spectrum_layer, N,
                 seed: int = 0, init_batch=None):
        m, shape, name, attrs = _qiddm(input_dim, hidden_features,
                                       spectrum_layer, N,
                                       down="pca2_bn_linear",
                                       up="linear_then_pca_inverse",
                                       pca_lazy=True,
                                       save="QIDDM_PP_features={h}_L={L}_N={N}")
        super().__init__(m, shape, name, seed=seed, init_batch=init_batch, **attrs)
