"""Multi-host initialization and data plumbing (jax.distributed).

The reference has no distributed backend (Ray on localhost, one trial at a
time — SURVEY §5.8). On TPU pods the single-program model extends across
hosts: every process calls :func:`initialize` before any JAX computation,
builds ONE mesh over the global device set (:func:`global_mesh`), and feeds
per-process host data through :func:`host_local_batch`; XLA's SPMD
partitioner inserts the cross-host collectives (ICI within a slice, DCN
across slices).

Exercised for real by tests/test_distributed.py: two local CPU processes
(Gloo collectives) train a DP step and run a 2-trial ``sweep_lr`` over a
process-spanning mesh, matching single-process results bit-for-bit-ish
(reduction-order tolerance).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``).

    Returns True if distributed mode was initialized, False when running
    single-process (no coordinator configured) — callers can treat False as
    "single host" and proceed.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        if num_processes is not None or process_id is not None:
            # explicit topology without a coordinator is a
            # misconfiguration, not "single host": silently proceeding
            # single-process here leaves the OTHER correctly-configured
            # hosts blocked inside jax.distributed.initialize waiting for
            # this peer, a hang with no error pointing at the cause
            raise ValueError(
                f"num_processes={num_processes}/process_id={process_id} "
                f"given but no coordinator address (arg or "
                f"JAX_COORDINATOR_ADDRESS) — this host would silently "
                f"run single-process while its peers wait for it")
        return False
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None or "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def global_mesh(axis_names: Tuple[str, ...] = ("data",),
                axis_sizes: Optional[Sequence[int]] = None):
    """A mesh over the GLOBAL device set (all processes).

    Device order follows ``jax.devices()`` (process-major), so a 1-D
    ``("data",)`` mesh gives each process a contiguous slab of the batch
    axis — host-local batches then map onto it without cross-host
    reshuffling (see :func:`host_local_batch`).
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    grid = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(grid, axis_names)


def host_local_batch(local_data, mesh, axis_name: str = "data"):
    """Assemble a GLOBAL batch-sharded array from each process's local
    shard (the multi-host data-loading path: every host reads only its own
    slice; no host ever materializes the global batch).

    local_data: (local_batch, ...) numpy array on THIS process. The global
    leading dim is ``local_batch * process_count``.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_data = np.asarray(local_data)
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, local_data)


def replicate_from_host(tree, mesh):
    """Replicate host-identical numpy pytrees onto every device of a
    (possibly multi-process) mesh. All processes must pass equal values —
    the standard way to feed params/small datasets to a pod program."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sharding, a, a.shape)

    return jax.tree_util.tree_map(put, tree)


def to_host(a):
    """numpy-ify a possibly non-addressable (multi-process) global array:
    all-gathers across processes when needed, plain np.asarray otherwise."""
    if getattr(a, "is_fully_addressable", True):
        return np.asarray(a)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(a, tiled=True))
