"""Sweep (vmapped trials) and mesh/data-parallel tests on the virtual
8-device CPU mesh."""

import json
import pathlib

import jax
import numpy as np
import pytest

from qiddm_tpu import data, nn
from qiddm_tpu.diffusion import Diffusion
from qiddm_tpu.parallel import make_mesh
from qiddm_tpu.sweep import _rung_plan, asha_rungs, sweep_lr
from qiddm_tpu.train import train_diffusion_scan


def _digits(label=4):
    x, y, h, w = data.mnist_8x8(n_classes=10, ds_size=400)
    return x[y == label], h, w


def test_sweep_lr_vmapped(tmp_path):
    x, h, w = _digits()
    res = sweep_lr(
        lambda s: nn.QIDDM_LL_noise(64, 4, 3, 1, 0, seed=s),
        lrs=[0.001, 0.01, 0.05],
        x_train=x, shape=(h, w), epochs=6, batch_size=8, T=4,
        local_dir=str(tmp_path), exp_name="t1", sample_iters=5, seed=0,
    )
    assert res.loss_curves.shape == (3, 6)
    assert np.all(np.isfinite(res.loss_curves))
    assert np.all(res.final_loss < res.loss_curves[:, 0])  # all learned
    assert len(res.ssim) == 3 and np.all(np.isfinite(res.ssim))
    # artifacts: tune_results-style schema
    tdirs = sorted(pathlib.Path(tmp_path, "t1").iterdir())
    assert len(tdirs) == 3
    for td in tdirs:
        params = json.loads((td / "params.json").read_text())
        assert "lr" in params and "epochs" in params
        rec = json.loads((td / "result.json").read_text().strip())
        assert {"loss", "ssim", "time_total_s", "node_ip"} <= set(rec)
        csv = (td / "progress.csv").read_text().strip().split("\n")
        assert csv[0] == "training_iteration,loss"
        assert len(csv) == 7
        assert any(p.suffix == ".pt" for p in td.iterdir())


def test_asha_rung_schedule():
    """asha_rungs mirrors AsyncHyperBand's defaults (grace=1, reduction=4):
    rungs at 1, 4, 16 keeping the top quarter — the reference scheduler's
    geometry (src/mnist_ray.py:207) over its epochs=30 budget."""
    assert asha_rungs(30) == [(1, 0.25), (4, 0.25), (16, 0.25)]
    assert asha_rungs(2) == [(1, 0.25)]
    assert asha_rungs(1) == []
    # explicit rung points expand to segment plans covering all epochs
    assert _rung_plan(30, asha_rungs(30)) == [
        (1, 0.25), (3, 0.25), (12, 0.25), (14, None)]
    assert _rung_plan(6, [(2, 0.5)]) == [(2, 0.5), (4, None)]
    # legacy fraction-list form still supported
    assert _rung_plan(6, [0.5]) == [(3, 0.5), (3, None)]
    assert _rung_plan(5, None) == [(5, None)]


@pytest.mark.slow
def test_sweep_successive_halving(tmp_path):
    x, h, w = _digits()
    res = sweep_lr(
        lambda s: nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=s),
        lrs=[1e-5, 0.005, 0.02, 0.04],
        x_train=x, shape=(h, w), epochs=4, batch_size=8, T=3,
        rungs=[0.5], sample_iters=4, seed=1,
    )
    # all trials have metrics; the kept half trained 4 epochs, dropped 2
    assert np.all(np.isfinite(res.ssim))
    trained_all = (res.loss_curves != 0).sum(axis=1)
    assert sorted(trained_all)[0] == 2 and sorted(trained_all)[-1] == 4


def test_mesh_data_parallel_training_matches_shapes():
    mesh = make_mesh(8, ("data",))
    assert mesh.devices.size == 8
    x, h, w = _digits()
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    # batch 8, T=7 -> expanded batch 56 = 8 devices x 7
    losses, wall = train_diffusion_scan(
        diff, x, epochs=3, batch_size=8, lr=0.01, T=7,
        key=jax.random.PRNGKey(0), mesh=mesh, warmup=False)
    assert losses.shape == (3,)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_trial_axis_sharding_on_mesh():
    """sweep_lr with a 'trial' mesh axis must (a) actually shard the stacked
    params over it and (b) produce the same losses as the unsharded sweep
    (same seed => same per-trial keys; 8 trials on 8 devices, no padding)."""
    mesh = make_mesh(8, ("trial",))
    x, h, w = _digits()
    lrs = [0.004, 0.006, 0.008, 0.01, 0.015, 0.02, 0.03, 0.04]
    kwargs = dict(x_train=x, shape=(h, w), epochs=2, batch_size=8,
                  T=3, sample_iters=3, seed=2)
    make = lambda s: nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=s)
    res_mesh = sweep_lr(make, lrs=lrs, mesh=mesh, **kwargs)
    assert res_mesh.param_sharding is not None
    assert "trial" in res_mesh.param_sharding
    res_plain = sweep_lr(make, lrs=lrs, **kwargs)
    assert res_plain.param_sharding is None
    np.testing.assert_allclose(res_mesh.loss_curves, res_plain.loss_curves,
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(res_mesh.ssim, res_plain.ssim,
                               rtol=2e-3, atol=1e-5)


def test_trial_sharding_pads_ragged_trial_counts(tmp_path):
    """3 trials on an 8-device trial axis: padded rows train but are
    excluded from results and artifacts."""
    mesh = make_mesh(8, ("trial",))
    x, h, w = _digits()
    res = sweep_lr(
        lambda s: nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=s),
        lrs=[0.005, 0.01, 0.02], x_train=x, shape=(h, w), epochs=2,
        batch_size=8, T=3, sample_iters=3, seed=3, mesh=mesh,
        local_dir=str(tmp_path), exp_name="pad",
    )
    assert res.loss_curves.shape == (3, 2)
    assert np.all(np.isfinite(res.loss_curves))
    assert np.all(np.isfinite(res.ssim))
    tdirs = sorted(pathlib.Path(tmp_path, "pad").iterdir())
    assert len(tdirs) == 3  # padding rows produce no artifacts
    for td in tdirs:
        assert any(p.suffix == ".pt" for p in td.iterdir())


def test_mesh_dp_loss_equality_vs_single_device():
    """Data-parallel training over the mesh must produce the SAME losses as
    the single-device run with the same key — the assertion that catches a
    wrong sharding constraint or gradient reduction."""
    mesh = make_mesh(8, ("data",))
    x, h, w = _digits()

    def run(mesh_arg):
        net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
        diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
        losses, _ = train_diffusion_scan(
            diff, x, epochs=3, batch_size=8, lr=0.01, T=7,
            key=jax.random.PRNGKey(0), mesh=mesh_arg, warmup=False)
        return np.asarray(losses)

    np.testing.assert_allclose(run(mesh), run(None), rtol=5e-4, atol=1e-5)


def test_mesh_sampling_matches_single_device():
    """Data-parallel serving: sampling a batch sharded over the mesh's
    'data' axis must produce the same images as the single-device sampler."""
    mesh = make_mesh(8, ("data",))
    x, h, w = _digits()
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w)).eval()
    first_x = jax.random.uniform(jax.random.PRNGKey(5), (16, 1, h, w))
    got = np.asarray(diff.sample(n_iters=5, first_x=first_x, only_last=True,
                                 mesh=mesh))
    want = np.asarray(diff.sample(n_iters=5, first_x=first_x,
                                  only_last=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
