"""Tests for QConv2d, UNet family, and the DeepConv baselines."""

import flax.linen  # noqa: F401  (ensure flax importable before models)
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import nn as qnn
from qiddm_tpu.nn.qconv import QConv2d

RNG = np.random.default_rng(11)


def _img(b=2, c=1, s=8):
    return jnp.asarray(RNG.uniform(size=(b, c, s, s)), jnp.float32)


def test_qconv_shapes_and_wires():
    m = QConv2d(in_channels=1, out_channels=8, kernel_size=(3, 3),
                padding=(1, 1), qdepth=2)
    assert m.wires == max(int(np.ceil(np.log2(9))), 3, 1) == 4
    x = _img()
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 8, 8, 8)
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.asarray(y).min() >= 0 and np.asarray(y).max() <= 1


def test_qconv_quantum_path_is_live():
    """The released reference never calls its circuit (dead qnode,
    nn/qconv.py:71-87). Ours must: output must depend on the weights."""
    m = QConv2d(in_channels=1, out_channels=4, qdepth=2)
    x = _img()
    v1 = m.init(jax.random.PRNGKey(0), x)
    v2 = jax.tree_util.tree_map(lambda p: p + 0.7, v1)
    y1, y2 = m.apply(v1, x), m.apply(v2, x)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # compat mode reproduces the dead-circuit behavior: weight independent
    mc = QConv2d(in_channels=1, out_channels=4, qdepth=2,
                 compat_dead_qnode=True)
    y1c = mc.apply(v1, x)
    y2c = mc.apply(v2, x)
    np.testing.assert_allclose(np.asarray(y1c), np.asarray(y2c))


@pytest.mark.slow
def test_unet_classical_forward_and_train_shapes():
    # 16x16 keeps the same depth-3 block structure as the reference 28x28
    # default at a fraction of the single-core compile time; the full
    # 28x28 build is covered by test_import_reference.py::test_import_unet
    net = qnn.UNetUndirected(3, 8, 0, img_shape=(16, 16))
    assert net.save_name() == "unet_undirected_d3_s8_d0"
    x = jnp.asarray(RNG.uniform(size=(2, 1, 16, 16)), jnp.float32)
    y = net(x)
    assert y.shape == (2, 1, 16, 16)
    # train-mode apply with mutable batch stats
    out, new_vars = net.module.apply(net.variables, x, train=True,
                                     mutable=["batch_stats"])
    assert out.shape == x.shape
    assert "batch_stats" in new_vars


def test_unet_quantum_small():
    net = qnn.UNetUndirected(2, 2, 1, img_shape=(8, 8))
    x = _img(b=1)
    y = net(x)
    assert y.shape == (1, 1, 8, 8)
    assert np.all(np.isfinite(np.asarray(y)))


def test_unet_directed_label_mask():
    net = qnn.UnetDirected(2, 4, 0, img_shape=(8, 8))
    assert net.save_name() == "unet_directed_d2_s4_d0"
    x = _img(b=3)
    y0 = net(x, np.zeros(3, np.int32))
    y1 = net(x, np.full(3, 5, np.int32))
    assert y0.shape == x.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_unet_simple_variant():
    net = qnn.UNetUndirectedS(2, 2, 1, img_shape=(8, 8))
    assert net.save_name() == "unet_s_undirected_d2_s2_d1"
    y = net(_img(b=1))
    assert y.shape == (1, 1, 8, 8)


def test_deep_conv_models():
    net = qnn.DeepConvUndirected([1, 4, 4, 1], (8, 8))
    assert net.save_name() == "deep_conv_undirected_1_4_4_1"
    y = net(_img())
    assert y.shape == (2, 1, 8, 8)
    assert np.asarray(y).min() >= 0 and np.asarray(y).max() <= 1  # sigmoid

    multi = qnn.DeepConvDirectedMulti([1, 4, 1], (8, 8))
    ym = multi(_img(b=3), np.arange(3))
    assert ym.shape == (3, 1, 8, 8)

    single = qnn.DeepConvDirectedSingle([1, 4, 1], (8, 8))
    ys = single(_img(b=3), np.arange(3))
    assert ys.shape == (3, 1, 8, 8)


def test_autopad_autocrop():
    from qiddm_tpu.nn.utils import autocrop, autopad

    a = jnp.zeros((1, 1, 8, 8))
    b = jnp.ones((1, 1, 6, 6))
    a2, b2 = autopad(a, b)
    assert b2.shape == (1, 1, 8, 8)
    assert float(b2[0, 0, 0, 0]) == 0.0  # padded corner
    a3, b3 = autocrop(b, a)
    assert b3.shape == (1, 1, 6, 6)


def test_qconv_dead_output_elimination_parity():
    """The optimized forward (even-row-sliced REAL matmuls,
    nn/qconv.py:92-116) must equal the naive formulation it replaced:
    full complex probs(U @ psi), slice even rows, scale by 2**wires / 2,
    clip, truncate to out_channels — values AND weight gradients."""
    from qiddm_tpu.nn.qconv import QConv2d
    from qiddm_tpu.sim.gates import qw_tanh
    from qiddm_tpu.sim.sel import sel_unitary
    from qiddm_tpu.sim.statevector import amplitude_embed

    m = QConv2d(in_channels=2, out_channels=5, kernel_size=(3, 3),
                padding=(1, 1), qdepth=2)
    x = _img(b=2, c=2, s=6)
    vars_ = m.init(jax.random.PRNGKey(3), x)

    def naive(vars_, x):
        weights = vars_["params"]["qweights"]
        b, c, h, w = x.shape
        kh, kw = m.kernel_size
        ph, pw = m.padding
        patches = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), (1, 1), [(ph, ph), (pw, pw)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        feats = patches.reshape(b, c * kh * kw, h * w)
        feats = jnp.transpose(feats, (0, 2, 1)).reshape(-1, c * kh * kw)
        feats = feats + 0.1
        dim = 2 ** m.wires
        psi = amplitude_embed(feats, m.wires, pad_with=0.5)
        u = sel_unitary(qw_tanh(weights), imprimitive="cnot")
        out = psi @ u.T                       # full complex (P, d) matmul
        q = jnp.abs(out) ** 2                 # probs
        q = jnp.clip(q * dim * 0.5, 0.0, 1.0)
        q = q[:, ::2][:, : m.out_channels]    # even rows, truncate
        if q.shape[-1] < m.out_channels:
            q = jnp.pad(q, ((0, 0), (0, m.out_channels - q.shape[-1])))
        return jnp.transpose(
            q.reshape(b, h, w, m.out_channels), (0, 3, 1, 2))

    y_opt = m.apply(vars_, x)
    y_naive = naive(vars_, x)
    np.testing.assert_allclose(np.asarray(y_opt), np.asarray(y_naive),
                               rtol=2e-5, atol=2e-6)

    g_opt = jax.grad(lambda v: jnp.sum(m.apply(v, x) ** 2))(vars_)
    g_naive = jax.grad(lambda v: jnp.sum(naive(v, x) ** 2))(vars_)
    np.testing.assert_allclose(
        np.asarray(g_opt["params"]["qweights"]),
        np.asarray(g_naive["params"]["qweights"]), rtol=2e-4, atol=1e-4)


def test_qconv_medium_shapes_and_prep_unitarity():
    import jax.numpy as jnp
    from qiddm_tpu.nn.qconv import QConv2dMedium, QConv2dSlow, _prep_unitary

    assert QConv2dSlow is QConv2dMedium
    m = QConv2dMedium(in_channels=2, out_channels=4, qdepth=2)
    x = _img(b=2, c=2, s=6)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 4, 6, 6)
    assert np.all(np.isfinite(np.asarray(y)))
    # state-prep unitaries: unitary, and U|0> = v
    v = RNG.normal(size=(3, 8)) + 1j * RNG.normal(size=(3, 8))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    u = np.asarray(_prep_unitary(jnp.asarray(v, jnp.complex64)))
    for i in range(3):
        np.testing.assert_allclose(u[i] @ u[i].conj().T, np.eye(8), atol=1e-5)
        np.testing.assert_allclose(u[i][:, 0], v[i], atol=1e-5)
