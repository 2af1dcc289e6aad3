"""Mesh construction and sharding helpers (jax.sharding / GSPMD)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",),
              axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With one axis the mesh is 1-D over all devices; with several,
    ``axis_sizes`` gives the grid (product must equal device count).
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available")
        devices = devices[:n_devices]
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    grid = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(grid, axis_names)


def shard_leading_axis(mesh: Mesh, tree, axis_name: str = "data"):
    """Place arrays with their leading axis sharded over ``axis_name``."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)


def dp_constraint(x, mesh: Optional[Mesh], axis_name: str = "data"):
    """Constrain the leading (batch) axis of ``x`` to the data mesh axis.

    No-op when mesh is None (single chip).
    """
    if mesh is None:
        return x
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
