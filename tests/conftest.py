"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests execute on a virtual 8-device CPU mesh (the driver
separately dry-runs the multi-chip path; real benches run on the TPU chip).
These env vars must be set before JAX initializes its backends, hence the
module-level assignment in conftest.
"""

import atexit
import os
import shutil
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"

# Hermetic data dir: the suite must behave the same whether or not the user
# has built real-data caches (tools/extract_reference_data.py) in the
# default ~/qiddm_data — tests exercise the documented offline fallbacks.
# Tests that want the real caches opt in via the real_data_dir fixture.
_REAL_DATA_DIR = os.environ.get(
    "QIDDM_DATA_DIR", os.path.expanduser("~/qiddm_data"))
os.environ["QIDDM_DATA_DIR"] = tempfile.mkdtemp(prefix="qiddm_test_data_")
atexit.register(shutil.rmtree, os.environ["QIDDM_DATA_DIR"],
                ignore_errors=True)
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

# The suite's wall time is almost entirely XLA compiles on a single CPU
# core; the persistent compilation cache makes reruns (CI re-entry, local
# iteration) hit warm compiles. Correctness is unaffected — cache keys
# include program HLO and jaxlib version.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/qiddm_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def real_data_dir():
    """Path to the user's real-data cache dir (tools/extract_reference_data
    output); skips the test when the caches haven't been built."""
    import pathlib

    p = pathlib.Path(_REAL_DATA_DIR)
    if not (p / "bloodmnist_28.npz").exists():
        pytest.skip("real-data caches not built "
                    "(run tools/extract_reference_data.py)")
    return p
