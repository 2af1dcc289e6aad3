"""Stateful wrapper giving flax modules the reference's torch-module surface.

The reference drivers instantiate denoisers by name and hand them to the
``Diffusion`` engine (reference src/mnist_exm.py:424, :443). ``DenoiserShim``
reproduces that surface — construct with the reference's ctor args, call on
images, ``save_name()``, checkpointable state — while keeping the functional
(module, variables) pair accessible for the jitted train/sample paths.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _square_or_flat(input_dim: int) -> Tuple[int, int]:
    side = int(math.isqrt(input_dim))
    if side * side == input_dim:
        return (side, side)
    return (input_dim, 1)


class DenoiserShim:
    """Holds a flax module + its initialized variables.

    ``variables`` is a dict with collections ``params`` (trainable),
    optionally ``batch_stats`` and ``pca_state``.
    """

    def __init__(self, module, img_shape: Tuple[int, int], *, seed: int = 0,
                 save_name_str: str = "", directed: bool = False,
                 init_batch: Optional[np.ndarray] = None):
        self.module = module
        self.img_shape = img_shape
        self._save_name = save_name_str
        self.directed = directed
        w, h = img_shape
        if init_batch is None:
            # PCA-bearing models need >= hidden samples to fit; use a small
            # random batch for init (weights don't depend on it, PCA state of
            # lazy models does — drivers may pass a real init_batch).
            init_batch = jax.random.uniform(
                jax.random.PRNGKey(seed + 1), (32, 1, w, h))
        # init must run under jit: the axon TPU backend cannot execute ops
        # eagerly (complex exp etc. are UNIMPLEMENTED op-by-op) and a failed
        # eager init poisons the whole process asynchronously.
        self.variables = jax.jit(
            lambda k, xb: module.init(k, xb, train=False))(
                jax.random.PRNGKey(seed), jnp.asarray(init_batch))

    # --- functional access -------------------------------------------------
    @property
    def params(self):
        return self.variables["params"]

    @property
    def extra_variables(self):
        return {k: v for k, v in self.variables.items() if k != "params"}

    @property
    def mutable_collections(self):
        """Collections to pass as ``mutable=`` in train-mode apply.
        Returns False (not an empty list) when there are none, so flax
        returns a bare output instead of an (out, vars) tuple."""
        cols = [k for k in self.variables if k == "batch_stats"]
        return cols if cols else False

    def replace_variables(self, params=None, **collections):
        v = dict(self.variables)
        if params is not None:
            v["params"] = params
        v.update(collections)
        self.variables = v

    def apply(self, variables, x, train: bool = False, mutable=False):
        return self.module.apply(variables, x, train=train, mutable=mutable)

    # --- torch-like surface -------------------------------------------------
    # train=True must open the model's mutable collections (batch_stats) —
    # a BatchNorm model crashes under flax otherwise; the updated stats are
    # folded back into self.variables like torch's in-place running stats.
    def _jitted_apply(self, train: bool):
        cache = getattr(self, "_apply_cache", None)
        if cache is None:
            cache = self._apply_cache = {}
        if train not in cache:
            module = self.module
            mutable = self.mutable_collections if train else False
            cache[train] = jax.jit(
                lambda v, x: module.apply(v, x, train=train,
                                          mutable=mutable))
        return cache[train]

    def __call__(self, x, train: bool = False):
        # jit (cached): the axon TPU backend cannot execute ops eagerly
        out = self._jitted_apply(train)(self.variables, jnp.asarray(x))
        return self._fold_mutable(out, train)

    def _fold_mutable(self, out, train: bool):
        if not (train and self.mutable_collections):
            return out
        out, new_vars = out
        self.variables = {**self.variables, **new_vars}
        return out

    def _jitted_apply_directed(self, train: bool):
        cache = getattr(self, "_apply_cache_dir", None)
        if cache is None:
            cache = self._apply_cache_dir = {}
        if train not in cache:
            module = self.module
            mutable = self.mutable_collections if train else False
            cache[train] = jax.jit(
                lambda v, x, y: module.apply(v, x, y, train=train,
                                             mutable=mutable))
        return cache[train]

    def forward(self, x):
        return self(x)

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(self.params))

    def save_name(self) -> str:
        return self._save_name

    def __repr__(self):
        return f"{type(self).__name__}({self._save_name})"
