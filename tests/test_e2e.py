"""End-to-end smoke: the minimum slice from SURVEY §7 — train Qdense and
QIDDM-L diffusion models on sklearn digits (mnist_8x8), check the loss
decreases and samples score reasonable SSIM."""

import jax
import numpy as np
import pytest

from qiddm_tpu import data, metrics, nn
from qiddm_tpu.diffusion import Diffusion
from qiddm_tpu.train import train_diffusion


def _digits_for_label(label=4, ds_size=200):
    x, y, h, w = data.mnist_8x8(n_classes=10, ds_size=ds_size)
    x = x[y == label]
    return x, h, w


def _run_training(net, x, h, w, *, epochs=12, lr=0.02, T=5, batch_size=8):
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    losses = train_diffusion(diff, x, epochs=epochs, batch_size=batch_size,
                             lr=lr, T=T, key=jax.random.PRNGKey(0))
    return diff, losses


def test_qdense_digits_end_to_end():
    x, h, w = _digits_for_label()
    net = nn.QDenseUndirected_old(8, 8)
    diff, losses = _run_training(net, x, h, w)
    assert len(losses) == 12
    assert losses[-1] < losses[0] * 0.9, losses
    # sample and score
    key = jax.random.PRNGKey(1)
    first_x = jax.random.uniform(key, (10, 1, 8, 8)) * 0.75 + 0.5
    grid = diff.eval().sample(n_iters=8, first_x=first_x)
    assert grid.shape == (9 * 8, 10 * 8)
    gen = np.asarray(grid).reshape(9, 8, 10, 8).transpose(0, 2, 1, 3)
    gen = gen[:, :, None, :, :]
    real = x.reshape(-1, 1, 8, 8)[:20]
    ssim = metrics.ssim_iterations(gen, real, gen_img_count=5)
    # trained samples should look more like digits than the initial noise
    assert ssim[-1] > ssim[0]
    assert ssim[-1] > 0.05, ssim


def test_qiddm_ll_digits_end_to_end():
    x, h, w = _digits_for_label()
    net = nn.QIDDM_LL_noise(64, 5, 4, 2, 0)
    diff, losses = _run_training(net, x, h, w, epochs=10, lr=0.03)
    assert losses[-1] < losses[0] * 0.9, losses
    out = diff.eval().sample(n_iters=5, first_x=None, only_last=True,
                             key=jax.random.PRNGKey(2))
    assert out.shape == (10, 1, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_noise_goal_training_runs():
    x, h, w = _digits_for_label()
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0)
    diff = Diffusion(net=net, prediction_goal="noise", shape=(h, w))
    losses = train_diffusion(diff, x, epochs=3, batch_size=8, lr=0.01, T=4,
                             key=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(losses))
    out = diff.eval().sample(n_iters=4, only_last=True,
                             key=jax.random.PRNGKey(1))
    assert float(np.asarray(out).min()) >= 0.0
    assert float(np.asarray(out).max()) <= 1.0


def test_torch_like_forward_api():
    """The reference-style `diff(x=..., T=..., verbose=True)` call path
    (src/mnist_exm.py:180) — jitted under the hood. Pure loss evaluation
    requires the explicit loss_only opt-in (see the trap test below)."""
    x, h, w = _digits_for_label()
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w)).train()
    per_elem, recon = diff(x=x[:4].reshape(-1, 1, 8, 8), T=3, verbose=True,
                           loss_only=True)
    assert per_elem.shape == (4 * 3, 1, 8, 8)
    assert recon.shape == (4 * 3, 1, 8, 8)
    (loss,) = diff(x=x[:4].reshape(-1, 1, 8, 8), T=3, loss_only=True)
    assert np.isfinite(float(loss))


def test_torch_like_train_call_raises_without_optimizer():
    """A verbatim port of the reference driver loop (`opt.zero_grad();
    diff(x=...); opt.step()`, src/mnist_exm.py:176-182 around
    src/models.py:67's internal .backward()) would run and silently never
    learn — the train-mode call must refuse instead (VERDICT r2 item 6)."""
    x, h, w = _digits_for_label()
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w)).train()
    with pytest.raises(RuntimeError, match="attach_optimizer"):
        diff(x=x[:4].reshape(-1, 1, 8, 8), T=3)


def test_torch_like_train_call_steps_with_attached_optimizer():
    """With attach_optimizer, the torch-style call IS a training step:
    parameters move and the loss trends down over repeated calls."""
    import optax

    x, h, w = _digits_for_label()
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w)).train()
    diff.attach_optimizer(optax.adam(0.05))
    p0 = np.asarray(jax.tree_util.tree_leaves(net.params)[0]).copy()
    losses = [float(diff(x=x[:8].reshape(-1, 1, 8, 8), T=3)[0])
              for _ in range(12)]
    p1 = np.asarray(jax.tree_util.tree_leaves(net.params)[0])
    assert not np.allclose(p0, p1), "parameters did not move"
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses
