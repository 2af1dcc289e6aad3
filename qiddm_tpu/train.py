"""Training loop utilities shared by the experiment drivers.

The reference trains with torch Adam in a Python loop over DataLoader batches
(src/mnist_exm.py:148-203). Here a whole epoch is one jitted ``lax.scan``
program (``Diffusion.make_epoch_fn``); the Python loop only crosses the
host-device boundary once per epoch to record the loss.
"""

from __future__ import annotations

import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax


def train_diffusion(diff, x_train, *, epochs: int, batch_size: int, lr: float,
                    T: int, key=None, start_epoch: int = 0,
                    verbose: bool = False, opt_state=None) -> List[float]:
    """Train ``diff`` (a Diffusion) in place; returns per-epoch loss values.

    Loss bookkeeping matches the reference: the recorded epoch value is the
    SUM over batches of each batch's mean loss (src/mnist_exm.py:176-185).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    x_train = jnp.asarray(x_train).reshape(len(x_train), -1)
    n_train = int(x_train.shape[0])
    batch_size = min(batch_size, n_train)

    optimizer = optax.adam(lr)
    params = diff.net.params
    extra_vars = diff.net.extra_variables
    if opt_state is None:
        # segmented callers (--checkpoint-every, resume) should pass the
        # previous segment's opt_state back in — a fresh init here zeroes
        # Adam's moments and changes the optimization trajectory
        opt_state = optimizer.init(params)
    epoch_fn = diff.make_epoch_fn(optimizer, T, batch_size)

    loss_values: List[float] = []
    remaining = epochs - start_epoch
    t0 = time.time()
    for e in range(max(remaining, 0)):
        # fold in the ABSOLUTE epoch index so resumed runs draw fresh
        # shuffles/noise instead of replaying epochs 0..remaining
        sub = jax.random.fold_in(key, start_epoch + e)
        params, opt_state, extra_vars, losses = epoch_fn(
            params, opt_state, extra_vars, sub, x_train, n_train)
        epoch_loss = float(jnp.sum(losses))
        loss_values.append(epoch_loss)
        if verbose:
            print(f"epoch {start_epoch + e + 1}/{epochs} "
                  f"loss={epoch_loss:.6f} ({time.time() - t0:.1f}s)")
    diff.net.replace_variables(params=params, **extra_vars)
    return loss_values


def train_diffusion_scan(diff, x_train, *, epochs: int, batch_size: int,
                         lr: float, T: int, key=None, mesh=None,
                         warmup: bool = True, opt_state=None,
                         return_opt_state: bool = False):
    """Fully-compiled variant: ALL epochs inside one scan.

    ``warmup=True`` (benchmark mode) runs the program once to compile, then
    times a second identical run — wall excludes compile but the device
    trains twice. Drivers pass ``warmup=False``: one run, wall includes
    compile. With ``mesh``, the compute batch shards over the data axis.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    x_train = jnp.asarray(x_train).reshape(len(x_train), -1)
    n_train = int(x_train.shape[0])
    batch_size = min(batch_size, n_train)

    optimizer = optax.adam(lr)
    params = diff.net.params
    extra_vars = diff.net.extra_variables
    if opt_state is None:
        # segmented callers (--checkpoint-every, resume) should pass the
        # previous segment's opt_state back in — a fresh init here zeroes
        # Adam's moments and changes the optimization trajectory
        opt_state = optimizer.init(params)
    run_j = diff.make_multi_epoch_fn(optimizer, T, batch_size, epochs,
                                     mesh=mesh)

    if warmup:
        # compile + warm run (fetch to host: on the axon backend
        # block_until_ready does not reliably synchronize)
        out = run_j(params, opt_state, extra_vars, key, x_train, n_train)
        np.asarray(out[3])
    t0 = time.time()
    params, opt_state, extra_vars, epoch_losses = run_j(
        params, opt_state, extra_vars, key, x_train, n_train)
    epoch_losses = np.asarray(epoch_losses)
    wall = time.time() - t0
    diff.net.replace_variables(params=params, **extra_vars)
    if return_opt_state:
        return epoch_losses, wall, opt_state
    return epoch_losses, wall
