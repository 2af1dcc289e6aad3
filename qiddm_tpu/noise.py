"""Forward-noising schedules (the reference's src/noise.py, re-done in JAX).

All four schedules keep the reference's exact math and return layout:
``(batch * tau, pixels)`` with batch-major ordering (reference rearranges
``"tau batch pixels -> (batch tau) pixels"``). Randomness is explicit via a
PRNG key instead of global torch state; iterative schedules compile to
``lax.scan`` instead of Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def l1_norm(data):
    """Row-wise L1 normalization (reference src/noise.py:9)."""
    n = jnp.sum(jnp.abs(data), axis=-1, keepdims=True)
    return data / jnp.maximum(n, 1e-12)


def l2_norm(data):
    """Row-wise L2 normalization (reference src/noise.py:13)."""
    n = jnp.sqrt(jnp.sum(data * data, axis=-1, keepdims=True))
    return data / jnp.maximum(n, 1e-12)


def normalize_mean(target_data, inp):
    """Rescale noisy rows to the per-image mean of the clean data
    (reference src/noise.py:17-37). ``inp`` may be (tau, batch, pixels) or
    ((batch tau), pixels)."""
    if target_data.ndim == 1:
        target_data = target_data[None, :]
    btp = False
    if inp.ndim == 2:
        btp = True
        batch = target_data.shape[0]
        inp = rearrange(inp, "(batch tau) pixels -> tau batch pixels", batch=batch)
    inp_mean = jnp.mean(inp, axis=-1, keepdims=True)  # (tau, batch, 1)
    orig_mean = jnp.mean(target_data, axis=-1, keepdims=True)[None]  # (1, b, 1)
    # eps guard: an all-zero row (blank frame) gives inp_mean == 0, and
    # 0/0 would NaN the whole chain (the sibling norms clamp the same way)
    moved = inp / jnp.maximum(inp_mean, 1e-12) * orig_mean
    if btp:
        moved = rearrange(moved, "tau batch pixels -> (batch tau) pixels")
    return moved


def _weighting(tau: int, decay_mod: float, dtype):
    w = jnp.linspace(0.0, 1.0, tau, dtype=dtype) ** decay_mod
    return w / jnp.maximum(w.max(), 1e-12)


def add_normal_noise_multiple(key, data, tau: int, decay_mod: float = 1.0):
    """Blend each image with ONE Normal(0.5, 0.2) noise image at tau weights,
    then clip to [0, 1] (reference src/noise.py:105-126 — the only schedule
    the experiment drivers use, e.g. src/mnist_exm.py:445 via models.py:46).
    """
    if data.ndim == 1:
        data = data[None, :]
    batch, pixels = data.shape
    noise = 0.5 + 0.2 * jax.random.normal(key, (batch, pixels), dtype=data.dtype)
    w = _weighting(tau, decay_mod, data.dtype)[:, None, None]  # (tau, 1, 1)
    noisy = data[None] * (1.0 - w) + noise[None] * w
    noisy = jnp.clip(noisy, 0.0, 1.0)
    return rearrange(noisy, "tau batch pixels -> (batch tau) pixels")


def add_uniform_noise_multiple(key, data, tau: int, decay_mod: float = 2.0):
    """Same blend with a single U[0,1) noise image, no clip
    (reference src/noise.py:64-82)."""
    if data.ndim == 1:
        data = data[None, :]
    batch, pixels = data.shape
    noise = jax.random.uniform(key, (batch, pixels), dtype=data.dtype)
    w = _weighting(tau, decay_mod, data.dtype)[:, None, None]
    noisy = data[None] * (1.0 - w) + noise[None] * w
    return rearrange(noisy, "tau batch pixels -> (batch tau) pixels")


def add_uniform_noise_iteratively(key, data, tau: int, decay_mod: float = 1.0):
    """Iterative blend with FRESH uniform noise per step; weights are the
    L2-normalized power curve (reference src/noise.py:40-61)."""
    if data.ndim == 1:
        data = data[None, :]
    batch, pixels = data.shape
    w = jnp.linspace(0.0, 1.0, tau, dtype=data.dtype) ** decay_mod
    w = w / jnp.maximum(jnp.sqrt(jnp.sum(w * w)), 1e-12)  # l2_norm of the 1-D curve

    def step(x_prev, inputs):
        w_t, k = inputs
        noise = jax.random.uniform(k, (batch, pixels), dtype=data.dtype)
        x_t = x_prev * (1.0 - w_t) + noise * w_t
        return x_t, x_t

    keys = jax.random.split(key, tau - 1)
    _, rest = jax.lax.scan(step, data, (w[1:], keys))
    noisy = jnp.concatenate([data[None], rest], axis=0)
    return rearrange(noisy, "tau batch pixels -> (batch tau) pixels")


def add_noise_normal_iteratively(key, data, tau: int, decay_mod: float = 0.4):
    """Iterative Gaussian perturbation with linearly growing std, clamped to
    [0, 1] each step (reference src/noise.py:85-102)."""
    if data.ndim == 1:
        data = data[None, :]
    batch, pixels = data.shape
    stds = jnp.linspace(0.0, decay_mod, tau, dtype=data.dtype)

    def step(x_prev, inputs):
        std_t, k = inputs
        x_t = x_prev + std_t * jax.random.normal(k, (batch, pixels), dtype=data.dtype)
        x_t = jnp.clip(x_t, 0.0, 1.0)
        return x_t, x_t

    keys = jax.random.split(key, tau - 1)
    _, rest = jax.lax.scan(step, data, (stds[1:], keys))
    noisy = jnp.concatenate([data[None], rest], axis=0)
    return rearrange(noisy, "tau batch pixels -> (batch tau) pixels")


SCHEDULES = {
    "add_normal_noise_multiple": add_normal_noise_multiple,
    "add_uniform_noise_multiple": add_uniform_noise_multiple,
    "add_uniform_noise_iteratively": add_uniform_noise_iteratively,
    "add_noise_normal_iteratively": add_noise_normal_iteratively,
}
