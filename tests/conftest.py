"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests execute on a virtual 8-device CPU mesh (the driver
separately dry-runs the multi-chip path; real benches run on the TPU chip).
These env vars must be set before JAX initializes its backends, hence the
module-level assignment in conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (after env setup)

# The axon TPU plugin registers itself in sitecustomize before conftest runs,
# so the env var alone is not enough — pin the platform via config too.
jax.config.update("jax_platforms", "cpu")
