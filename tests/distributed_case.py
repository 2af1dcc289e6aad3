"""Shared model/data definition for the jax.distributed test: the worker
processes and the in-suite single-process reference run must build the
EXACT same computation, so it lives in one importable place."""

import numpy as np

CASE = {
    "shape": (8, 8),
    "T": 2,           # tau chain: batch 8 expands to 16 rows (divides 4 dev)
    "batch_size": 8,
    "epochs": 2,
    "lr": 0.01,
    "sweep_lrs": [0.01, 0.03],
    "n_train": 32,
}


def make_net(seed: int = 0):
    from qiddm_tpu import nn

    return nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=seed)


def make_x_train():
    rng = np.random.default_rng(11)
    return rng.uniform(size=(CASE["n_train"], 64)).astype(np.float32)
