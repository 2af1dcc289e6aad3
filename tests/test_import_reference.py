"""Import the reference's SHIPPED trained checkpoints (results/emnist.zip)
into qiddm_tpu models and sample from them — real cross-framework parity."""

import pathlib
import subprocess
import zipfile

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from qiddm_tpu import nn
from qiddm_tpu.ckpt import load_reference_checkpoint
from qiddm_tpu.diffusion import Diffusion

ZIP = pathlib.Path("/root/reference/results/emnist.zip")

pytestmark = pytest.mark.skipif(not ZIP.exists(),
                                reason="reference artifacts not mounted")


@pytest.fixture(scope="module")
def emnist_ckpts(tmp_path_factory):
    root = tmp_path_factory.mktemp("emnist")
    with zipfile.ZipFile(ZIP) as z:
        z.extractall(root)
    return root


def _sample_ok(net, iters=3, s=28):
    diff = Diffusion(net=net, prediction_goal="data", shape=(s, s)).eval()
    out = np.asarray(diff.sample(n_iters=iters, only_last=True,
                                 key=jax.random.PRNGKey(0)))
    assert out.shape == (10, 1, s, s)
    assert np.all(np.isfinite(out))
    return out


def test_import_qiddm_pl(emnist_ckpts):
    p = next(emnist_ckpts.rglob("QIDDM_PL_noise=8_L=6_N=2_noise_22.pt"))
    net = nn.QIDDM_PL_noise(784, 8, 6, 2, 0)
    losses, epochs = load_reference_checkpoint(net, p)
    assert epochs == 50 and len(losses) == 50
    ck = torch.load(p, map_location="cpu", weights_only=False)
    np.testing.assert_allclose(
        np.asarray(net.params["qweights"]),
        ck["model_state_dict"]["net.weights1"].numpy(), atol=0)
    np.testing.assert_allclose(
        np.asarray(net.params["linear_up"]["kernel"]),
        ck["model_state_dict"]["net.linear_up.weight"].numpy().T, atol=0)
    _sample_ok(net)


def test_import_qdense(emnist_ckpts):
    p = next(emnist_ckpts.rglob(
        "QDenseUndirected_old_noise60_w28_h28_noise0_noise_22.pt"))
    net = nn.QDenseUndirected_old_noise(60, 28, 0)
    load_reference_checkpoint(net, p)
    out = _sample_ok(net)
    # trained Qdense output should not be uniform noise: spatial structure
    assert out.std() > 1e-4


def test_import_qnn(emnist_ckpts):
    p = next(emnist_ckpts.rglob(
        "QNN_linear_features=8_qdepth=6_add_noise=0_noise_22.pt"))
    net = nn.QNN(784, 8, 6)
    load_reference_checkpoint(net, p)
    _sample_ok(net)


def test_import_differn(emnist_ckpts):
    p = next(emnist_ckpts.rglob(
        "differN_old_pca=15_N=2_w28_h28_noise0_noise_22.pt"))
    net = nn.differN_old_pca(28, 15, 2)
    load_reference_checkpoint(net, p)
    _sample_ok(net)


@pytest.mark.slow
def test_import_unet(emnist_ckpts):
    p = next(emnist_ckpts.rglob("unet_undirected_d3_s8_d0_noise_22.pt"))
    net = nn.UNetUndirected(3, 8, 0, img_shape=(28, 28))
    load_reference_checkpoint(net, p)
    # batch stats must have been imported (not the fresh init zeros/ones)
    bs = net.variables["batch_stats"]["down0"]["bn0"]
    assert float(np.abs(np.asarray(bs["mean"])).max()) > 0
    _sample_ok(net)


def test_import_strict_rejects_unknown(emnist_ckpts):
    p = next(emnist_ckpts.rglob("QNN_linear_features=8_qdepth=6_add_noise=0_noise_22.pt"))
    net = nn.QDenseUndirected_old_noise(60, 28, 0)  # wrong model
    with pytest.raises((ValueError, KeyError)):
        load_reference_checkpoint(net, p)


def test_import_quantum_unet_statedict():
    """Quantum-conv UNet checkpoints (torch QConv2d stores a single SEL
    `weights` tensor per conv) must map onto qweights."""
    import numpy as np

    net = nn.UNetUndirected(2, 2, 1, img_shape=(8, 8))
    params = net.variables["params"]
    sd = {}
    rng = np.random.default_rng(0)

    def fake_bn(prefix, n):
        sd[f"{prefix}.weight"] = rng.normal(size=(n,))
        sd[f"{prefix}.bias"] = rng.normal(size=(n,))
        sd[f"{prefix}.running_mean"] = rng.normal(size=(n,))
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(size=(n,))) + 1

    for i, name in enumerate(k for k in params if k.startswith("down")):
        blk = f"net.down_blocks.{i}.net"
        for ci, idx in (("conv0", 0), ("conv1", 3)):
            sd[f"{blk}.{idx}.weights"] = rng.normal(
                size=params[name][ci]["qweights"].shape)
        n = params[name]["bn0"]["scale"].shape[0]
        fake_bn(f"{blk}.1", n)
        fake_bn(f"{blk}.4", n)
    for i, name in enumerate(k for k in params
                             if k.startswith("up") and k != "up_conv"):
        blk = f"net.up_blocks.{i}"
        sd[f"{blk}.up_conv.1.weights"] = rng.normal(
            size=params[name]["up_conv"]["qweights"].shape)
        for ci, idx in (("conv0", 0), ("conv1", 3)):
            sd[f"{blk}.net.{idx}.weights"] = rng.normal(
                size=params[name][ci]["qweights"].shape)
        n = params[name]["bn0"]["scale"].shape[0]
        fake_bn(f"{blk}.net.2", n)
        fake_bn(f"{blk}.net.4", n)
    sd["net.final_conv.weights"] = rng.normal(
        size=params["final_conv"]["qweights"].shape)

    from qiddm_tpu.ckpt import import_torch_state_dict

    import_torch_state_dict(net, sd, strict=True)
    got = np.asarray(net.variables["params"]["final_conv"]["qweights"])
    np.testing.assert_allclose(got, sd["net.final_conv.weights"], atol=1e-6)
    _sample_ok(net, iters=2, s=8)


@pytest.mark.parametrize("make", [
    lambda s: nn.QIDDM_LL_noise(64, 4, 2, 2, 0, seed=s),
    lambda s: nn.QDenseUndirected_old_noise(3, 8, 0, seed=s),
    lambda s: nn.QIDDM_L_B(64, 4, 2, 1, seed=s),       # batchnorm stats
    lambda s: nn.UNetUndirected(2, 4, 0, seed=s),       # UNet family
    lambda s: nn.UNetUndirectedS(2, 4, 3, seed=s),      # simple quantum UNet
    lambda s: nn.QIDDM_PP_old(64, 2, 2, 1, seed=s),     # pickled-PCA family
])
def test_export_roundtrip(make, tmp_path):
    """export_torch_state_dict inverts import_torch_state_dict: a model
    exported to a reference-named torch checkpoint and re-imported into a
    DIFFERENTLY seeded instance must reproduce the original's outputs
    (checkpoints trained here are portable back to the reference)."""
    import jax.numpy as jnp

    from qiddm_tpu.ckpt import (load_reference_checkpoint,
                                save_reference_checkpoint)

    src = make(0)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(2, 1, 8, 8)),
                    jnp.float32)
    want = np.asarray(src(x))

    p = save_reference_checkpoint(src, tmp_path / "export.pt",
                                  loss_values=[0.3, 0.2], epochs=7)
    dst = make(1)  # different init — values must come from the checkpoint
    losses, epochs = load_reference_checkpoint(dst, p, strict=True)
    assert losses == [0.3, 0.2] and epochs == 7
    np.testing.assert_allclose(np.asarray(dst(x)), want, atol=1e-6)


def test_export_key_names_match_shipped_checkpoint(emnist_ckpts):
    """The exported state_dict's key SET must equal the reference's own
    shipped checkpoint keys for the same model class — the definitive
    driver-compat check (net.-prefixed, weights1 naming, bn running
    stats)."""
    import torch

    from qiddm_tpu.ckpt import export_torch_state_dict

    p = next(emnist_ckpts.rglob("QIDDM_PL_noise=8_L=6_N=2_noise_22.pt"))
    shipped = torch.load(p, map_location="cpu", weights_only=False)
    shipped_keys = set(shipped["model_state_dict"].keys())
    ours = set(export_torch_state_dict(
        nn.QIDDM_PL_noise(784, 8, 6, 2, 0)).keys())
    assert ours == shipped_keys, (
        f"missing={sorted(shipped_keys - ours)} "
        f"extra={sorted(ours - shipped_keys)}")
