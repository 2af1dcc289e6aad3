"""Preemption-safe training (cli/common.py::train): SIGTERM mid-training
defers to the next segment boundary, checkpoints the current state, and
exits 128+signum; rerunning the same command resumes from that
checkpoint (SURVEY §5.3 elastic recovery — the reference can only
degrade-to-fresh)."""

import os
import pathlib
import signal

import numpy as np
import pytest

from qiddm_tpu import nn
from qiddm_tpu.ckpt import load_diffusion
from qiddm_tpu.diffusion import Diffusion


def _args(mnist_exm, tmp_path, epochs):
    return mnist_exm.parse_args([
        "--model", "QIDDM_LL_noise", "64", "3", "1", "1",
        "--data", "mnist_8x8", "--img_size", "8",
        "--ds-size", "60", "--epochs", str(epochs), "--batch_size", "8",
        "--tau", "2", "--checkpoint-every", "1",
        "--save-path", str(tmp_path) + "/p_",
        "--load-path", str(tmp_path) + "/p_"])


def test_sigterm_checkpoints_and_resumes(tmp_path, monkeypatch):
    from qiddm_tpu.cli import common, mnist_exm

    monkeypatch.chdir(tmp_path)
    args = _args(mnist_exm, tmp_path, epochs=4)

    # deliver SIGTERM synchronously during the FIRST training segment —
    # the handler defers it; train() must checkpoint at the boundary and
    # exit 128+15
    real_scan = common.train_diffusion_scan
    calls = {"n": 0}

    def scan_then_signal(*a, **kw):
        out = real_scan(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    monkeypatch.setattr(common, "train_diffusion_scan", scan_then_signal)
    with pytest.raises(SystemExit) as ei:
        common.run_labels(args, labels=[1], tau_test=3)
    assert ei.value.code == 128 + signal.SIGTERM
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    net = nn.QIDDM_LL_noise(64, 3, 1, 1, 0, seed=999)
    diff = Diffusion(net=net, prediction_goal="data", shape=(8, 8))
    losses, epochs = load_diffusion(diff, str(tmp_path) + "/p_1/noise_0", 1)
    assert epochs == 1 and len(losses) == 1  # one segment landed

    # rerun the same command without the signal: resumes at epoch 1,
    # finishes to 4 (fresh parse — run_labels mutates args paths and the
    # SystemExit unwound before it restored them)
    monkeypatch.setattr(common, "train_diffusion_scan", real_scan)
    scores = common.run_labels(_args(mnist_exm, tmp_path, epochs=4),
                               labels=[1], tau_test=3)
    assert scores
    losses2, epochs2 = load_diffusion(diff, str(tmp_path) + "/p_1/noise_0",
                                      1)
    assert epochs2 == 4 and len(losses2) == 4
    np.testing.assert_allclose(losses2[:1], losses, atol=0)


def test_sigterm_in_final_segment_still_exits(tmp_path, monkeypatch):
    """No --checkpoint-every (one segment = the whole run): a signal
    caught during that segment must still checkpoint and exit 128+signum
    instead of proceeding to test/score (the pod's grace period is
    running out)."""
    from qiddm_tpu.cli import common, mnist_exm

    monkeypatch.chdir(tmp_path)
    args = mnist_exm.parse_args([
        "--model", "QIDDM_LL_noise", "64", "3", "1", "1",
        "--data", "mnist_8x8", "--img_size", "8",
        "--ds-size", "60", "--epochs", "2", "--batch_size", "8",
        "--tau", "2",
        "--save-path", str(tmp_path) + "/f_",
        "--load-path", str(tmp_path) + "/f_"])

    real_scan = common.train_diffusion_scan

    def scan_then_signal(*a, **kw):
        out = real_scan(*a, **kw)
        os.kill(os.getpid(), signal.SIGTERM)
        return out

    monkeypatch.setattr(common, "train_diffusion_scan", scan_then_signal)
    with pytest.raises(SystemExit) as ei:
        common.run_labels(args, labels=[1], tau_test=3)
    assert ei.value.code == 128 + signal.SIGTERM

    net = nn.QIDDM_LL_noise(64, 3, 1, 1, 0, seed=999)
    diff = Diffusion(net=net, prediction_goal="data", shape=(8, 8))
    losses, epochs = load_diffusion(diff, str(tmp_path) + "/f_1/noise_0", 1)
    assert epochs == 2 and len(losses) == 2  # full state landed
