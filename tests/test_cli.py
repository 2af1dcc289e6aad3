"""Driver-surface tests: run each CLI with tiny configs on CPU."""

import json
import os
import pathlib

import numpy as np
import pytest

from qiddm_tpu.cli import common


def _fast_args(mod, tmp_path, extra=()):
    return mod.parse_args([
        "--data", "mnist_8x8", "--img_size", "8",
        "--model", "QIDDM_LL_noise", "64", "4", "2", "1",
        "--ds-size", "120", "--epochs", "2", "--batch_size", "8",
        "--tau", "3",
        "--save-path", str(tmp_path) + "/run_",
        "--load-path", str(tmp_path) + "/run_",
        *extra,
    ])


def test_model_registry_covers_reference_names():
    for name in ["QDenseUndirected_old", "QDenseUndirected_old_noise",
                 "QNN_A", "QNN_noise", "QNN", "differN_noise",
                 "QIDDM_PL", "QIDDM_LL_noise", "QIDDM_L", "QIDDM_PP_old",
                 "UNetUndirected", "UnetDirected", "UNetUndirectedS",
                 "UnetDirectedS", "DeepConvUndirected"]:
        assert name in common.MODEL_REGISTRY, name


def test_data_registry_covers_reference_loaders():
    for name in ["mnist_8x8", "mnist_28x28", "mnist_32x32", "fashion_28x28",
                 "emnist_28x28", "cifar10_32x32", "celeba_32x32",
                 "celeba_64x64", "lfw_28x28", "lfw_64x64", "lfw_128x128",
                 "lfw_512x512", "bloodmnist_28x28", "PneumoniaMNIST_28x28",
                 "pathmnist_28x28", "fruit_64x64", "logo2kplus_28x28",
                 "xray_64x64"]:
        assert name in common.DATA_REGISTRY, name


def test_mnist_exm_driver_end_to_end(tmp_path, monkeypatch):
    from qiddm_tpu.cli import mnist_exm

    monkeypatch.chdir(tmp_path)
    args = _fast_args(mnist_exm, tmp_path, extra=["--label", "4"])
    scores = common.run_labels(args, labels=range(4, 5), tau_test=4)
    assert "QIDDM_LL_noise" in scores
    assert len(scores["QIDDM_LL_noise"]["ssim"]) == 1
    # checkpoint written with the reference naming convention
    ckpts = list(pathlib.Path(tmp_path).rglob("*_4.pt"))
    assert any("QIDDM_LL_noise=4_L=2_N=1" in p.name for p in ckpts)
    # per-step PNGs + metric plots
    assert list(pathlib.Path(tmp_path).rglob("step_1.png"))
    assert list(pathlib.Path(tmp_path).rglob("SSIM_*.png"))


@pytest.mark.slow
def test_driver_checkpoint_resume(tmp_path, monkeypatch):
    from qiddm_tpu.cli import mnist_exm

    monkeypatch.chdir(tmp_path)
    args = _fast_args(mnist_exm, tmp_path, extra=["--label", "4"])
    common.run_labels(args, labels=range(4, 5), tau_test=3)
    # second run resumes: start_epoch == epochs -> no retraining needed
    args2 = _fast_args(mnist_exm, tmp_path, extra=["--label", "4"])
    scores = common.run_labels(args2, labels=range(4, 5), tau_test=3)
    assert scores


def test_noise_driver_sweep(tmp_path, monkeypatch):
    from qiddm_tpu.cli import mnist_noise
    from qiddm_tpu.cli.noise_common import run_noise_sweep

    monkeypatch.chdir(tmp_path)
    args = mnist_noise.parse_args([
        "--data", "mnist_8x8", "--img_size", "8",
        "--model", "QIDDM_LL_noise", "64", "4", "2", "1",
        "--ds-size", "120", "--epochs", "1", "--batch_size", "8",
        "--tau", "2", "--label", "3",
        "--save-path", str(tmp_path) + "/n_",
        "--load-path", str(tmp_path) + "/n_",
    ])
    res = run_noise_sweep(args, noise_types=[2, 4],
                          intensities=[0.0, 0.05], tau_test=3)
    r = res["QIDDM_LL_noise"]
    assert set(r) == {2, 4}
    assert len(r[2]["ssim"]) == 2
    assert np.all(np.isfinite(r[2]["ssim"]))
    # sampler-output caches written
    assert list(pathlib.Path(tmp_path).rglob("*_outp_*.pt"))


def test_rebuttal_driver_augmentation(tmp_path, monkeypatch):
    from qiddm_tpu.cli import bloodmnist

    monkeypatch.chdir(tmp_path)
    args = bloodmnist.parse_args([
        "--model", "QIDDM_LL_noise", "784", "4", "2", "1",
        "--ds-size", "30", "--epochs", "1", "--batch_size", "8",
        "--tau", "2",
        "--save-path", str(tmp_path) + "/b_",
        "--load-path", str(tmp_path) + "/b_",
    ])
    scores = common.run_labels(args, labels=[2], augment_to=40, tau_test=3)
    assert scores


def test_augment_rotation_reaches_target():
    x = np.random.default_rng(0).uniform(size=(5, 64))
    y = np.arange(5)
    x2, y2 = common.augment_rotation(x, y, 8, 8, 20, seed=1)
    assert x2.shape == (20, 64) and y2.shape == (20,)
    np.testing.assert_allclose(x2[:5], x)
    assert x2.min() >= 0 and x2.max() <= 1


@pytest.mark.slow
def test_ray_driver_small(tmp_path, monkeypatch):
    from qiddm_tpu.cli import mnist_ray

    monkeypatch.chdir(tmp_path)
    rows, best = mnist_ray.main([
        "--data", "mnist_8x8", "--img_size", "8", "--label", "4",
        "--ds-size", "150", "--num-samples", "4", "--epochs", "2",
        "--batch_size", "8", "--tau", "2", "--hidden", "4",
        "--L-min", "2", "--L-max", "2",  # ONE group: halving must bite
        "--local-dir", str(tmp_path / "tune_results"),
    ])
    assert len(rows) == 4
    assert best["ssim"] == max(r["ssim"] for r in rows)
    # tune_results-style artifacts on disk
    results = list(pathlib.Path(tmp_path, "tune_results").rglob("result.json"))
    assert len(results) == 4
    recs = [json.loads(r.read_text().strip()) for r in results]
    assert all("ssim" in r and "loss" in r and "early_stopped" in r
               for r in recs)
    # default halving (AsyncHyperBand analogue, grace=1 reduction=4): the
    # single 4-trial group MUST early-stop its bottom 3 at the epoch-1 rung
    stopped = [r for r in recs if r["early_stopped"]]
    assert len(stopped) == 3, recs
    assert all(r["training_iteration"] == 1 for r in stopped)
    survivors = [r for r in recs if not r["early_stopped"]]
    assert survivors and all(r["training_iteration"] == 2
                             for r in survivors)


@pytest.mark.slow
def test_vmap_labels_mode(tmp_path, monkeypatch):
    from qiddm_tpu.cli import mnist_exm

    monkeypatch.chdir(tmp_path)
    args = _fast_args(mnist_exm, tmp_path, extra=["--vmap-labels"])
    scores = common.run_labels(args, labels=[3, 4], tau_test=3)
    s = scores["QIDDM_LL_noise"]
    assert len(s["ssim"]) == 2 and len(s["psnr"]) == 2
    assert all(np.isfinite(v) for v in s["ssim"])
    # per-label checkpoints written
    for label in (3, 4):
        hits = list(pathlib.Path(tmp_path).rglob(f"*_{label}.pt"))
        assert hits, f"missing checkpoint for label {label}"


@pytest.mark.slow
def test_checkpoint_every(tmp_path, monkeypatch):
    from qiddm_tpu.cli import mnist_exm

    monkeypatch.chdir(tmp_path)
    args = _fast_args(mnist_exm, tmp_path,
                      extra=["--label", "4", "--checkpoint-every", "1",
                             "--epochs", "3"])
    common.run_labels(args, labels=[4], tau_test=3)
    ckpts = list(pathlib.Path(tmp_path).rglob("*_4.pt"))
    assert ckpts


def test_per_model_lr_not_leaked():
    """Each model must get ITS OWN default lr; a previous model's assignment
    to args.lr must not leak (reference resolves per model,
    src/mnist_exm.py:438)."""
    from qiddm_tpu.cli import mnist_exm

    args = mnist_exm.parse_args([])
    lr1 = common.model_lr(args, "QIDDM_LL_noise")
    args.lr = lr1  # drivers do this
    lr2 = common.model_lr(args, "QNN_noise")
    assert lr1 == 0.0255 and lr2 == 0.01011
    # explicit --lr overrides everything
    args2 = mnist_exm.parse_args(["--lr", "0.5"])
    assert common.model_lr(args2, "QNN_noise") == 0.5
    args2.lr = 0.123
    assert common.model_lr(args2, "QIDDM_LL_noise") == 0.5


@pytest.mark.slow
def test_noise_sweep_cache_roundtrip(tmp_path, monkeypatch, capsys):
    """Second sweep run must HIT the sampler-output cache (it used to look
    under noise_0 while writing under noise_<type>)."""
    from qiddm_tpu.cli import mnist_noise
    from qiddm_tpu.cli.noise_common import run_noise_sweep

    monkeypatch.chdir(tmp_path)
    argv = ["--data", "mnist_8x8", "--img_size", "8",
            "--model", "QIDDM_LL_noise", "64", "4", "2", "1",
            "--ds-size", "120", "--epochs", "1", "--batch_size", "8",
            "--tau", "2",
            "--save-path", str(tmp_path) + "/n_",
            "--load-path", str(tmp_path) + "/n_"]
    args = mnist_noise.parse_args(argv)
    args.label = 0
    run_noise_sweep(args, noise_types=[2], intensities=[0.05], tau_test=3)
    capsys.readouterr()
    args2 = mnist_noise.parse_args(argv)
    args2.label = 0
    res = run_noise_sweep(args2, noise_types=[2], intensities=[0.05],
                          tau_test=3)
    out = capsys.readouterr().out
    assert "outp loaded successfully" in out
    assert np.isfinite(res["QIDDM_LL_noise"][2]["ssim"][0])


def test_sample_serving_cli(tmp_path):
    """The standalone sampling/serving driver: load a checkpoint, generate
    batches (single-device and sharded over the 8-device mesh), write
    artifacts."""
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.ckpt import save_diffusion
    from qiddm_tpu.cli import sample as sample_cli
    from qiddm_tpu.diffusion import Diffusion

    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(8, 8))
    ckpt_path = save_diffusion(diff, str(tmp_path), 0, [0.5], 1)

    argv = ["--ckpt", str(ckpt_path),
            "--model", "QIDDM_LL_noise", "64", "4", "2", "1",
            "--img_size", "8", "--n", "16", "--iters", "3",
            "--out", str(tmp_path / "s1"), "--format", "npz",
            "--batches", "2", "--seed", "3"]
    imgs = sample_cli.main(argv)
    assert imgs.shape == (32, 1, 8, 8)
    assert (tmp_path / "s1" / "samples.npz").exists()

    imgs_mesh = sample_cli.main(argv[:-6] + [
        "--out", str(tmp_path / "s2"), "--format", "npz",
        "--batches", "2", "--seed", "3",
        "--mesh-devices", str(len(jax.devices()))])
    np.testing.assert_allclose(np.asarray(imgs_mesh), np.asarray(imgs),
                               atol=1e-5)

    # orbax checkpoints serve identically
    from qiddm_tpu.ckpt import save_orbax

    opath = tmp_path / "serving.orbax"
    save_orbax(opath, net.variables, loss_values=[0.5], epochs=1)
    imgs_orbax = sample_cli.main(
        ["--ckpt", str(opath),
         "--model", "QIDDM_LL_noise", "64", "4", "2", "1",
         "--img_size", "8", "--n", "16", "--iters", "3",
         "--out", str(tmp_path / "s3"), "--format", "npz",
         "--batches", "2", "--seed", "3"])
    np.testing.assert_allclose(np.asarray(imgs_orbax), np.asarray(imgs),
                               atol=1e-5)
