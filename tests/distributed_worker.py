"""Worker process for tests/test_distributed.py.

Two of these run side by side (CPU backend, 2 virtual devices each, Gloo
collectives) and exercise the REAL multi-host path: jax.distributed
initialization via qiddm_tpu.parallel.distributed, a process-spanning
4-device ``data`` mesh training one DP program, and a 2-trial ``sweep_lr``
over a process-spanning ``trial`` mesh. Process 0 writes the numeric
results to JSON for the test to compare against single-process runs.

Usage: python distributed_worker.py <process_id> <port> <out_json>
"""

import json
import os
import pathlib
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = pathlib.Path(sys.argv[3])

# env BEFORE importing jax (backends initialize once)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)
os.environ.setdefault("QIDDM_DATA_DIR", "/tmp/qiddm_dist_data")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from qiddm_tpu.parallel import distributed  # noqa: E402

assert distributed.initialize(), "env-driven initialize() returned False"
assert jax.process_count() == 2
assert jax.device_count() == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from qiddm_tpu import nn  # noqa: E402
from qiddm_tpu.diffusion import Diffusion  # noqa: E402
from qiddm_tpu.sweep import sweep_lr  # noqa: E402
from tests.distributed_case import (CASE, make_net, make_x_train)  # noqa: E402

results = {}

# --- DP training over the process-spanning data mesh -----------------------
mesh = distributed.global_mesh(("data",))
net = make_net(seed=0)
diff = Diffusion(net=net, prediction_goal="data", shape=CASE["shape"])
optimizer = optax.adam(CASE["lr"])
x_train = make_x_train()

run = diff.make_multi_epoch_fn(optimizer, CASE["T"], CASE["batch_size"],
                               CASE["epochs"], mesh=mesh)
opt_state = jax.jit(optimizer.init)(net.params)
params, opt_state, extra, losses = run(
    net.params, opt_state, net.extra_variables,
    jax.random.PRNGKey(5), jnp.asarray(x_train), len(x_train))
results["dp_losses"] = [float(v) for v in distributed.to_host(losses)]
results["dp_param_checksum"] = float(
    sum(jnp.abs(l).sum()
        for l in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(distributed.to_host, params))))

# --- host-local data assembly + host replication ---------------------------
# every host feeds only ITS slice; the assembled global array must equal
# the full dataset, and a host-replicated pytree must round-trip exactly
half = len(x_train) // 2
local = np.asarray(x_train[pid * half:(pid + 1) * half])
global_x = distributed.host_local_batch(local, mesh)
assert global_x.shape[0] == len(x_train)
assert not global_x.is_fully_addressable  # really process-spanning
np.testing.assert_array_equal(distributed.to_host(global_x),
                              np.asarray(x_train))
results["host_local_batch_sum"] = float(jnp.sum(global_x))

replicated = distributed.replicate_from_host(
    {"w": np.arange(6.0, dtype=np.float32), "b": np.float32(2.5)}, mesh)
np.testing.assert_array_equal(distributed.to_host(replicated["w"]),
                              np.arange(6.0, dtype=np.float32))
results["replicated_b"] = float(distributed.to_host(replicated["b"]))
assert distributed.is_multiprocess()

# --- 2-trial sweep over a process-spanning trial mesh ----------------------
trial_mesh = distributed.global_mesh(("trial",))
res = sweep_lr(make_net, CASE["sweep_lrs"], x_train, shape=CASE["shape"],
               epochs=CASE["epochs"], batch_size=CASE["batch_size"],
               T=CASE["T"], seed=3)
# local_dir exercises the artifact path cross-process: the to_host
# allgather is a collective every process must enter (a process-0-only
# gather deadlocks), while only process 0 writes the files
art_dir = out_path.parent / "sweep_artifacts"
res_m = sweep_lr(make_net, CASE["sweep_lrs"], x_train, shape=CASE["shape"],
                 epochs=CASE["epochs"], batch_size=CASE["batch_size"],
                 T=CASE["T"], seed=3, mesh=trial_mesh,
                 local_dir=str(art_dir))
results["sweep_final_loss"] = [float(v) for v in res_m.final_loss]
results["sweep_final_loss_nomesh"] = [float(v) for v in res.final_loss]
results["sweep_ssim"] = [float(v) for v in res_m.ssim]
results["sweep_param_sharding"] = res_m.param_sharding
results["sweep_artifacts_written"] = sorted(
    p.name for p in art_dir.rglob("result.json"))

if pid == 0:
    out_path.write_text(json.dumps(results))
jax.distributed.shutdown()
