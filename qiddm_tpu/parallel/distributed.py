"""Multi-host initialization (jax.distributed) for pod-scale runs.

The reference has no distributed backend (Ray on localhost, one trial at a
time — SURVEY §5.8). On TPU pods, the single-program model extends across
hosts: call ``initialize()`` once per process before any JAX computation,
then build meshes over ``jax.devices()`` as usual — data/trial shardings
ride ICI within a slice and DCN across slices.

This is a thin, documented wrapper: the single-chip CI environment cannot
exercise multi-host paths, so there is deliberately no logic here beyond
environment-driven defaults.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or standard env vars.

    Returns True if distributed mode was initialized, False when running
    single-process (no coordinator configured) — callers can treat False as
    "single host" and proceed.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
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
