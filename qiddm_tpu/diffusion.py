"""Diffusion engine: forward-noising pairs, jitted train step, scan sampler.

Mirrors the reference ``Diffusion`` wrapper (src/models.py:8-150) with the
training/sampling math kept exactly:

* training ("data" goal): noise each image into a tau+1 chain, train the
  denoiser to map chain step t+1 -> t, MSE (src/models.py:44-72);
* training ("noise" goal): predict the *added* noise via the affine map
  ``(net(x) - 0.5) * 0.1`` (src/models.py:74-104);
* sampling: iterate the denoiser from a random image; "data" goal replaces x,
  "noise" goal subtracts the scaled prediction and clips (src/models.py:106-147).

TPU-native differences: the per-batch torch loop with ``.backward()`` inside
``forward`` becomes a pure jitted ``value_and_grad`` step; whole epochs run
as one ``lax.scan`` over shuffled index batches; sampling is one
``lax.scan`` over denoise iterations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from einops import rearrange

from . import noise as noise_mod


class Diffusion:
    """Torch-like wrapper pairing a denoiser shim with a noise schedule.

    Matches the reference ctor (src/models.py:14-27):
    ``Diffusion(net, noise_f, prediction_goal, shape, loss)``.
    ``noise_f`` takes ``(key, data, tau, decay_mod)`` (our schedules are
    explicitly keyed).
    """

    def __init__(self, net, noise_f=noise_mod.add_normal_noise_multiple,
                 prediction_goal: str = "data",
                 shape: Tuple[int, int] = (28, 28), loss: str = "mse"):
        self.net = net
        self.add_noise = noise_f
        self.prediction_goal = prediction_goal
        # NOTE: ``shape`` is (height, width) — the drivers pass (h, w) from
        # the loaders (cli/common.py) and every internal use follows that
        # order; all reference datasets are square so the distinction never
        # bites there, but external callers should pass (h, w).
        self.width, self.height = shape
        self.loss = loss
        self.training = False

    # --- torch-like mode switches ------------------------------------------
    def train(self, mode: bool = True):
        self.training = mode
        return self

    def eval(self):
        return self.train(False)

    def save_name(self) -> str:
        suffix = "_noise" if self.prediction_goal == "noise" else ""
        return f"{self.net.save_name()}{suffix}"

    def parameters(self):
        return jax.tree_util.tree_leaves(self.net.params)

    # --- functional pieces (jit-friendly) ----------------------------------
    def _chain_loss(self, params, extra_vars, key, x_flat, T: int, *,
                    valid=None, mesh=None):
        """The tau-chain training loss shared by every train path.

        Builds the noisy chain, pairs step t+1 -> t, runs the denoiser on
        the expanded batch, and takes the MSE for the active goal
        (reference src/models.py:44-104). With ``valid`` (a per-row 0/1
        vector), padded rows get zero weight and the mean normalizes by the
        real count (the dropless final-partial-batch scheme). Returns
        (loss, (per_elem, recon, new_mutable_vars)).
        """
        from .parallel.mesh import dp_constraint

        tau = T + 1
        chain = self.add_noise(key, x_flat, tau, 3.0)  # (B*tau, P) batch-major
        c = rearrange(chain, "(b t) p -> b t p", t=tau)
        noisy = rearrange(c[:, 1:, :], "b t (w h) -> (b t) 1 w h",
                          w=self.width, h=self.height)
        clean = rearrange(c[:, :-1, :], "b t (w h) -> (b t) 1 w h",
                          w=self.width, h=self.height)
        noisy = dp_constraint(noisy, mesh)
        clean = dp_constraint(clean, mesh)
        variables = {"params": params, **extra_vars}
        mutable = self.net.mutable_collections
        out = self.net.module.apply(variables, noisy, train=True,
                                    mutable=mutable)
        recon, new_vars = out if mutable else (out, {})
        if self.prediction_goal == "data":
            per_elem = (recon - clean) ** 2
        else:
            pred_noise = (recon - 0.5) * 0.1
            real_noise = noisy - clean
            per_elem = (pred_noise - real_noise) ** 2
        if valid is None:
            loss = per_elem.mean()
        else:
            wgt = jnp.repeat(valid, tau - 1)[:, None, None, None]
            denom = jnp.maximum(valid.sum(), 1.0) * (tau - 1) *                 per_elem[0].size
            loss = (per_elem * wgt).sum() / denom
        return loss, (per_elem, recon, new_vars)

    def loss_fn(self, params, extra_vars, key, x_flat, T: int):
        """One training-step loss on a flat image batch ``(B, pixels)``.

        Returns (loss, (per_elem_loss, recon, new_mutable_vars)).
        """
        return self._chain_loss(params, extra_vars, key, x_flat, T)

    def make_train_step(self, optimizer, T: int):
        """Jitted (params, opt_state, extra_vars, key, x_flat) -> updated."""

        @jax.jit
        def step(params, opt_state, extra_vars, key, x_flat):
            (loss, (_, _, new_vars)), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(params, extra_vars, key, x_flat, T)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            extra_vars = {**extra_vars, **new_vars}
            return params, opt_state, extra_vars, loss

        return step

    def make_epoch_fn(self, optimizer, T: int, batch_size: int, mesh=None):
        """One FULL epoch as a single jitted program (delegates to
        ``make_multi_epoch_fn`` with epochs=1; see it for semantics).
        Returns per-epoch summed losses of shape (1,)."""
        return self.make_multi_epoch_fn(optimizer, T, batch_size, 1,
                                        mesh=mesh)

    def make_multi_epoch_fn(self, optimizer, T: int, batch_size: int,
                            epochs: int, mesh=None):
        """ALL epochs' steps flattened into ONE ``lax.scan``.

        A nested scan (epochs over batches) compiles ~10x slower on the TPU
        toolchain than a single flattened scan; per-epoch losses are
        recovered by reshaping the per-step loss trace.

        With ``mesh``, the tau-expanded compute batch is sharded over the
        mesh's ``data`` axis (dataset stays replicated — it is tiny); XLA's
        SPMD partitioner inserts the gradient reductions over ICI. The
        expanded batch ``batch_size * T`` should divide the data-axis size.

        Dropless partial batches: the final partial batch pads with copies
        of row 0 that carry ZERO loss weight, so losses/gradients are
        exact for row-independent models. Models with batch-COUPLED
        forward computations (BatchNorm batch statistics, per-batch PCA
        refits) see the padded rows in those statistics — pick a
        batch_size dividing the dataset for bit-exactness there.
        """
        @functools.partial(jax.jit, static_argnames=("n_train",))
        def run(params, opt_state, extra_vars, key, x_train, n_train: int):
            n_batches = -(-n_train // batch_size)
            pad = n_batches * batch_size - n_train
            perm_key, noise_key = jax.random.split(key)

            def epoch_perm(k):
                p = jax.random.permutation(k, n_train)
                p = jnp.concatenate(
                    [p, jnp.full((pad,), -1, dtype=p.dtype)])
                return p.reshape(n_batches, batch_size)

            perm_keys = jax.random.split(perm_key, epochs)
            batches = jax.vmap(epoch_perm)(perm_keys).reshape(
                epochs * n_batches, batch_size)
            noise_keys = jax.random.split(noise_key, epochs * n_batches)

            def body(carry, inp):
                params, opt_state, extra_vars = carry
                idx, nk = inp
                valid = (idx >= 0).astype(x_train.dtype)
                xb = x_train[jnp.maximum(idx, 0)]

                def loss_fn(params):
                    loss, (_, _, new_vars) = self._chain_loss(
                        params, extra_vars, nk, xb, T, valid=valid,
                        mesh=mesh)
                    return loss, new_vars

                (loss, new_vars), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, {**extra_vars, **new_vars}), loss

            (params, opt_state, extra_vars), losses = jax.lax.scan(
                body, (params, opt_state, extra_vars), (batches, noise_keys))
            epoch_losses = losses.reshape(epochs, n_batches).sum(axis=1)
            return params, opt_state, extra_vars, epoch_losses

        return run

    def _denoise_scan(self, variables, first_x, n_iters: int,
                      noise_factor: float, mesh=None, traj_rng=None):
        """The iterative denoise loop shared by every sampling entry point
        (reference src/models.py:124-136): data goal replaces x with the
        prediction; noise goal subtracts the scaled prediction and clips.
        With ``mesh``, the image batch shards over the mesh's ``data`` axis
        (data-parallel serving — params replicate, no collectives needed in
        the forward loop)."""
        goal = self.prediction_goal
        net = self.net
        from .parallel.mesh import dp_constraint  # no-op when mesh is None

        def body(x, i):
            x = dp_constraint(x, mesh)
            # trajectory noise backend (net.noise_trajectories > 0): a
            # fresh "trajectories" rng stream per denoise iteration
            rngs = (None if traj_rng is None
                    else {"trajectories": jax.random.fold_in(traj_rng, i)})
            pred = net.module.apply(variables, x, train=False,
                                    mutable=False, rngs=rngs)
            if goal == "data":
                new_x = pred
            else:
                new_x = jnp.clip(x - (pred - 0.5) * 0.1 * noise_factor,
                                 0.0, 1.0)
            return new_x, new_x

        return jax.lax.scan(body, first_x, jnp.arange(n_iters))

    def sample_fn(self, variables, first_x, n_iters: int, *,
                  only_last: bool = False, step: int = 1,
                  noise_factor: float = 1.0, mesh=None, traj_rng=None):
        """Iterative denoising as one ``lax.scan`` (src/models.py:106-147).

        first_x: (b, 1, w, h). Returns either the last image (only_last) or
        the reference's stacked grid ``(iters*h, b*w)``. ``traj_rng`` seeds
        the trajectory noise backend when the net uses it.
        """
        last, xs = self._denoise_scan(variables, first_x, n_iters,
                                      noise_factor, mesh=mesh,
                                      traj_rng=traj_rng)
        if only_last:
            return last
        kept = xs[::step] if step > 1 else xs
        outp = jnp.concatenate([first_x[None], kept], axis=0)
        return rearrange(outp, "iters batch 1 height width -> "
                               "(iters height) (batch width)")

    def sample_stack_fn(self, variables, first_x, n_iters: int, *,
                        noise_factor: float = 1.0, traj_rng=None):
        """Like ``sample_fn`` but returns the raw (iters+1, b, 1, h, w) stack
        (metric/sweep-friendly; the reference reshapes its grid back to this
        layout before scoring, src/mnist_exm.py:221-224)."""
        _, xs = self._denoise_scan(variables, first_x, n_iters, noise_factor,
                                   traj_rng=traj_rng)
        return jnp.concatenate([first_x[None], xs], axis=0)

    # --- torch-like dispatch ------------------------------------------------
    def attach_optimizer(self, optimizer):
        """Make the torch-style train call actually TRAIN.

        The reference's ``forward`` runs ``.backward()`` internally
        (src/models.py:67) and the driver steps the optimizer around it; a
        verbatim port of that loop against a pure-JAX loss would silently
        never learn. With an optax optimizer attached, every train-mode
        ``diff(x=..., T=...)`` call performs one full jitted
        loss+grad+update step on ``net.variables`` (the external
        ``opt.zero_grad()``/``opt.step()`` lines become no-ops to delete).
        Prefer :meth:`make_train_step` / ``train_diffusion`` for real
        training loops — this shim exists for porting parity (PORTING.md).
        """
        self._optimizer = optimizer
        self._opt_state = None
        self._step_cache = {}
        self._call_count = 0
        return self

    def __call__(self, x=None, key=None, **kwargs):
        if self.training:
            T = int(kwargs.get("T", 10))
            x_flat = jnp.asarray(x).reshape(len(x), -1)
            optimizer = getattr(self, "_optimizer", None)
            if optimizer is None:
                if not kwargs.get("loss_only", False):
                    raise RuntimeError(
                        "Diffusion called in train mode without an attached "
                        "optimizer: unlike the reference (whose forward "
                        "calls .backward() internally, src/models.py:67), "
                        "this returns a pure loss and would silently train "
                        "NOTHING. Either diff.attach_optimizer(optax.adam"
                        "(lr)) to make this call step the parameters, pass "
                        "loss_only=True for pure loss evaluation, or use "
                        "train_diffusion()/make_train_step() for real "
                        "training loops (see PORTING.md).")
                key = key if key is not None else jax.random.PRNGKey(0)
                cache = getattr(self, "_loss_cache", None)
                if cache is None:
                    cache = self._loss_cache = {}
                if T not in cache:
                    cache[T] = jax.jit(functools.partial(self.loss_fn, T=T))
                loss, (per_elem, recon, _) = cache[T](
                    self.net.params, self.net.extra_variables, key, x_flat)
                if kwargs.get("verbose", False):
                    return jnp.abs(per_elem), jnp.abs(recon)
                return (jnp.abs(loss),)
            # optimizer attached: one full jitted train step per call
            # (fresh noise key per call — the reference relies on torch's
            # advancing global RNG)
            if key is None:
                key = jax.random.PRNGKey(self._call_count)
            self._call_count += 1
            if T not in self._step_cache:
                def step(params, opt_state, extra_vars, key, x_flat):
                    (loss, (per_elem, recon, new_vars)), grads = (
                        jax.value_and_grad(self.loss_fn, has_aux=True)(
                            params, extra_vars, key, x_flat, T))
                    updates, opt_state = optimizer.update(grads, opt_state,
                                                          params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, new_vars, loss, per_elem, recon

                self._step_cache[T] = jax.jit(step)
            if self._opt_state is None:
                self._opt_state = jax.jit(optimizer.init)(self.net.params)
            params, self._opt_state, new_vars, loss, per_elem, recon = (
                self._step_cache[T](self.net.params, self._opt_state,
                                    self.net.extra_variables, key, x_flat))
            self.net.replace_variables(params=params, **new_vars)
            if kwargs.get("verbose", False):
                return jnp.abs(per_elem), jnp.abs(recon)
            return (jnp.abs(loss),)
        return self.sample(first_x=x, **kwargs)

    forward = __call__

    def sample(self, n_iters, first_x=None, labels=None, show_progress=False,
               only_last=False, step=1, noise_factor=1.0, key=None,
               mesh=None, traj_rng=None):
        if first_x is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            first_x = jax.random.uniform(
                key, (10, 1, self.width, self.height))
        # cache the jitted sampler per static config — a fresh
        # jit(partial(...)) every call would recompile every time
        # (jax.sharding.Mesh hashes by device grid + axis names)
        cfg = (int(n_iters), bool(only_last), int(step), float(noise_factor),
               mesh, traj_rng is not None)
        cache = getattr(self, "_sample_cache", None)
        if cache is None:
            cache = self._sample_cache = {}
        if cfg not in cache:
            cache[cfg] = jax.jit(functools.partial(
                self.sample_fn, n_iters=cfg[0], only_last=cfg[1],
                step=cfg[2], noise_factor=cfg[3], mesh=mesh))
        if traj_rng is not None:
            return cache[cfg](self.net.variables, jnp.asarray(first_x),
                              traj_rng=traj_rng)
        return cache[cfg](self.net.variables, jnp.asarray(first_x))
