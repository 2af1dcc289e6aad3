"""Hyperparameter sweeps: vmapped trial parallelism replacing Ray Tune.

Reference: src/mnist_ray.py / src/fashion_ray.py — Ray Tune 2.4 with an
AsyncHyperBand scheduler over {lr, L, N, batch, epochs}, throttled to ONE
concurrent local trial (max_concurrent_trials=1, src/mnist_ray.py:213), each
trial reporting final ``loss`` and ``ssim`` and saving a checkpoint named
with both (src/mnist_ray.py:136-151).

TPU-native replacement:

* trials that share static structure (L, N, hidden, batch, epochs) differ
  only in learning rate and init seed -> ONE vmapped program trains all of
  them simultaneously (``optax.inject_hyperparams`` makes lr a dynamic
  optimizer-state leaf). On a multi-chip mesh the trial axis shards across
  chips.
* groups with different static structure run sequentially (they are
  different XLA programs by construction).
* synchronized successive halving stands in for AsyncHyperBand: train all
  trials to each rung, keep the top fraction by SSIM, continue. (Async
  per-trial early stopping has no vectorized analogue; divergence noted.)
* artifacts keep the tune_results schema: per-trial dir with params.json,
  result.json, progress.csv, and a checkpoint named with final loss+ssim.
"""

from __future__ import annotations

import json
import pathlib
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import metrics
from .ckpt import save_checkpoint
from .diffusion import Diffusion


@dataclass
class SweepResult:
    lrs: List[float]
    loss_curves: np.ndarray        # (n_trials, epochs)
    final_loss: np.ndarray         # (n_trials,)
    ssim: np.ndarray               # (n_trials,)
    best_by_loss: int = 0
    best_by_ssim: int = 0
    trial_dirs: List[str] = field(default_factory=list)


def sweep_lr(make_net: Callable[[int], object], lrs: Sequence[float],
             x_train, *, shape, epochs: int, batch_size: int, T: int,
             prediction_goal: str = "data", first_x=None, sample_iters: int = 5,
             real_for_ssim=None, seed: int = 0, local_dir: Optional[str] = None,
             exp_name: str = "sweep", mesh=None,
             rungs: Optional[List[float]] = None) -> SweepResult:
    """Train ``len(lrs)`` trials of the same architecture simultaneously.

    make_net(seed) -> DenoiserShim (used once for structure; per-trial params
    re-initialized with per-trial seeds). ``rungs``: optional keep-fractions
    applied at evenly spaced epoch checkpoints (successive halving) — trials
    dropped at a rung keep their metrics from that rung.
    """
    n_trials = len(lrs)
    lrs_arr = jnp.asarray(np.asarray(lrs, np.float32))
    proto = make_net(seed)
    module = proto.module
    h, w = shape
    x_train = jnp.asarray(np.asarray(x_train)).reshape(-1, h * w).astype(
        jnp.float32)
    n_train = int(x_train.shape[0])
    bs = min(batch_size, n_train)

    diff = Diffusion(net=proto, prediction_goal=prediction_goal, shape=shape)

    # per-trial init (different seeds, like independent Ray trials)
    dummy = x_train[: max(2, min(32, n_train))].reshape(-1, 1, h, w)
    init_keys = jax.random.split(jax.random.PRNGKey(seed), n_trials)
    stacked_vars = jax.jit(jax.vmap(
        lambda k: module.init(k, dummy, train=False)))(init_keys)
    params = stacked_vars["params"]
    extra = {k: v for k, v in stacked_vars.items() if k != "params"}

    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lrs_arr[0])
    opt_state = jax.jit(jax.vmap(optimizer.init))(params)
    # overwrite the injected lr leaf with the per-trial array
    opt_state = opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": lrs_arr})

    if first_x is None:
        # 15 starting images, the reference sweep's shape (src/mnist_ray.py:132)
        first_x = jax.random.uniform(
            jax.random.PRNGKey(seed + 7), (15, 1, h, w)) * 0.75 + 0.5

    rung_epochs = _rung_plan(epochs, rungs)
    alive = np.arange(n_trials)
    loss_curves = np.zeros((n_trials, epochs), np.float32)
    last_epoch = np.zeros((n_trials,), np.int64)
    ssims = np.zeros((n_trials,), np.float32)
    key = jax.random.PRNGKey(seed + 13)
    epochs_done = 0
    t_start = time.time()

    for seg_i, (seg_epochs, keep_frac) in enumerate(rung_epochs):
        run = diff.make_multi_epoch_fn(optimizer, T, bs, seg_epochs,
                                       mesh=mesh)
        vrun = jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0, None, None)),
                       static_argnums=(5,))
        key, sub = jax.random.split(key)
        trial_keys = jax.random.split(sub, params_count(params))
        params, opt_state, extra, seg_losses = vrun(
            params, opt_state, extra, trial_keys, x_train, n_train)
        seg_losses = np.asarray(seg_losses)
        loss_curves[alive, epochs_done:epochs_done + seg_epochs] = seg_losses
        epochs_done += seg_epochs
        last_epoch[alive] = epochs_done

        # score every live trial by SSIM (the sweep's selection metric,
        # reference src/mnist_ray.py:207 mode="max")
        cur_ssim = _score_ssim(diff, module, params, extra, first_x,
                               sample_iters, real_for_ssim, x_train, (h, w))
        ssims[alive] = cur_ssim

        if keep_frac is not None and keep_frac < 1.0 and len(alive) > 1:
            k = max(1, int(np.ceil(len(alive) * keep_frac)))
            top = np.argsort(-cur_ssim)[:k]
            sel = jnp.asarray(np.sort(top))
            params = jax.tree_util.tree_map(lambda a: a[sel], params)
            opt_state = jax.tree_util.tree_map(lambda a: a[sel]
                                               if hasattr(a, "ndim") and a.ndim > 0
                                               and a.shape[0] == len(cur_ssim)
                                               else a, opt_state)
            extra = jax.tree_util.tree_map(lambda a: a[sel], extra)
            alive = alive[np.sort(top)]

    final_loss = np.asarray(
        [loss_curves[t, max(last_epoch[t] - 1, 0)] for t in range(n_trials)],
        np.float32)

    result = SweepResult(
        lrs=list(map(float, lrs)), loss_curves=loss_curves,
        final_loss=final_loss, ssim=ssims,
        best_by_loss=int(np.argmin(final_loss)),
        best_by_ssim=int(np.argmax(ssims)),
    )

    if local_dir is not None:
        result.trial_dirs = _write_artifacts(
            local_dir, exp_name, result, params, extra, alive, proto,
            dict(batch_size=bs, epochs=epochs, T=T), t_start, last_epoch)
    return result


def params_count(params) -> int:
    return jax.tree_util.tree_leaves(params)[0].shape[0]


def _rung_plan(epochs: int, rungs: Optional[List[float]]):
    """[(segment_epochs, keep_frac_after_segment_or_None), ...]"""
    if not rungs:
        return [(epochs, None)]
    n = len(rungs) + 1
    seg = epochs // n
    plan = [(seg, rungs[i]) for i in range(len(rungs))]
    plan.append((epochs - seg * len(rungs), None))
    return plan


def _score_ssim(diff, module, params, extra, first_x, sample_iters,
                real_for_ssim, x_train, shape):
    """The reference sweep's selection metric (src/mnist_ray.py:156-192):
    clamp samples to [0, 1], scale to [0, 255]; min-max-normalize real
    images per image and scale to [0, 255]; SSIM of ONE generated image vs
    the first real image, last denoise iteration."""
    h, w = shape
    real = real_for_ssim if real_for_ssim is not None else x_train[:20]
    real = np.asarray(real).reshape(-1, 1, h, w).astype(np.float32)
    rmin = real.reshape(len(real), -1).min(1)[:, None, None, None]
    rmax = real.reshape(len(real), -1).max(1)[:, None, None, None]
    real = np.clip((real - rmin) / (rmax - rmin + 1e-7) * 255.0, 0.0, 255.0)

    def one(p, e):
        variables = {"params": p, **e}
        stack = diff.sample_stack_fn(variables, first_x, sample_iters)
        return jnp.clip(jnp.clip(stack, 0.0, 1.0) * 255.0, 0.0, 255.0)

    stacks = jax.jit(jax.vmap(one))(params, extra)  # (trials, iters+1, b,1,h,w)
    out = []
    for t in range(stacks.shape[0]):
        vals = metrics.get_ssim_single(np.asarray(stacks[t]), real,
                                       gen_img_count=1)
        out.append(vals[-1])
    return np.asarray(out, np.float32)


def _write_artifacts(local_dir, exp_name, result: SweepResult, params, extra,
                     alive, proto, cfg, t_start, last_epoch):
    """tune_results-compatible layout (reference tune_results/...):
    <local_dir>/<exp_name>/<trial>/params.json + result.json + progress.csv
    + checkpoint .pt named with final loss and ssim. training_iteration is
    the trial's ACTUAL trained epochs (halving-dropped trials stop early);
    time_total_s is the whole vmapped sweep's wall (trials train
    simultaneously — there is no meaningful per-trial wall)."""
    base = pathlib.Path(local_dir) / exp_name
    dirs = []
    elapsed = time.time() - t_start
    for t, lr in enumerate(result.lrs):
        td = base / f"trial_{t:05d}_lr={lr:.5f}"
        td.mkdir(parents=True, exist_ok=True)
        with open(td / "params.json", "w") as f:
            json.dump({"lr": lr, **cfg}, f, indent=2)
        rec = {
            "loss": float(result.final_loss[t]),
            "ssim": float(result.ssim[t]),
            "training_iteration": int(last_epoch[t]),
            "time_total_s": elapsed,
            "node_ip": "127.0.0.1",
            "trial_id": f"trial_{t:05d}",
        }
        with open(td / "result.json", "w") as f:
            f.write(json.dumps(rec) + "\n")
        with open(td / "progress.csv", "w") as f:
            f.write("training_iteration,loss\n")
            for e, v in enumerate(result.loss_curves[t][:int(last_epoch[t])]):
                f.write(f"{e + 1},{v}\n")
        # checkpoint for surviving trials
        pos = np.nonzero(alive == t)[0]
        if len(pos):
            i = int(pos[0])
            var_t = jax.tree_util.tree_map(lambda a: a[i], params)
            extra_t = jax.tree_util.tree_map(lambda a: a[i], extra)
            name = (f"{proto.save_name()}_"
                    f"{result.final_loss[t]:.4f}_{result.ssim[t]:.4f}.pt")
            save_checkpoint(td / name, {"params": var_t, **extra_t},
                            list(map(float, result.loss_curves[t])),
                            cfg["epochs"])
        dirs.append(str(td))
    return dirs
