"""Checkpoint save/load with the reference's artifact conventions.

Reference: ``torch.save({'model_state_dict', 'loss_values', 'epochs'})`` at
``<save_path>/<save_name()>_<label>.pt`` (src/mnist_exm.py:197-201), per-model
``save_model/load_model`` duplicates (nn/qdense.py:297-307), and
``QIDDM_PP_old`` pickling its fitted PCA into the checkpoint
(nn/qdense.py:1852-1870; our ``pca_state`` collection rides along in the
variables pytree automatically).

Format: a pickle of numpy-ified pytrees (portable, no torch dependency);
``.pt`` extension kept for filename parity with the reference artifacts.
"""

from __future__ import annotations

import pathlib
import pickle
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path, variables, loss_values: List[float], epochs: int,
                    extra: Optional[Dict[str, Any]] = None) -> pathlib.Path:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {
        "model_state_dict": _to_numpy_tree(variables),
        "loss_values": list(loss_values),
        "epochs": int(epochs),
    }
    if extra:
        blob.update(extra)
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    return path


def load_checkpoint(path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_diffusion(diff, save_path, label, loss_values, epochs):
    """Driver-level save (reference src/mnist_exm.py:189-201)."""
    sp = pathlib.Path(save_path) / f"{diff.save_name()}_{label}.pt"
    return save_checkpoint(sp, diff.net.variables, loss_values, epochs)


def load_diffusion(diff, load_path, label) -> Tuple[List[float], int]:
    """Driver-level load; returns (loss_values, start_epoch) and degrades to
    a fresh model when missing (reference src/mnist_exm.py:294-323)."""
    if str(load_path).endswith(".pt"):
        lp = pathlib.Path(load_path)
    else:
        lp = pathlib.Path(load_path) / f"{diff.save_name()}_{label}.pt"
    print(lp)
    try:
        ckpt = load_checkpoint(lp)
    except FileNotFoundError:
        print("Failed to load model: File not found.\n")
        return [], 0
    restored = jax.tree_util.tree_map(
        lambda a: a, ckpt["model_state_dict"])
    diff.net.variables = restored
    print("Model loaded successfully.\n")
    return ckpt.get("loss_values", []), ckpt.get("epochs", 0)
