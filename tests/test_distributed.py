"""jax.distributed exercised for REAL (VERDICT r2 item 3): two local CPU
processes form a 4-device cluster (Gloo collectives), train a DP step over
a process-spanning ``data`` mesh, and run a 2-trial ``sweep_lr`` over a
process-spanning ``trial`` mesh. Results must match the same computation
run single-process in this suite (identical seeds; reduction-order
tolerance).

The reference has nothing here — its Ray Tune runs one local trial at a
time (src/mnist_ray.py:213, result.json "node_ip": "127.0.0.1"); SURVEY
§5.8 names jax.distributed + collectives as the rebuild's story.
"""

import json
import pathlib
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qiddm_tpu.diffusion import Diffusion
from qiddm_tpu.sweep import sweep_lr
from tests.distributed_case import CASE, make_net, make_x_train

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    out = tmp_path_factory.mktemp("dist") / "results.json"
    port = _free_port()
    worker = pathlib.Path(__file__).parent / "distributed_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=worker.parent.parent)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return json.loads(out.read_text())


def _single_process_reference():
    net = make_net(seed=0)
    diff = Diffusion(net=net, prediction_goal="data", shape=CASE["shape"])
    optimizer = optax.adam(CASE["lr"])
    x_train = make_x_train()
    run = diff.make_multi_epoch_fn(optimizer, CASE["T"], CASE["batch_size"],
                                   CASE["epochs"])
    opt_state = jax.jit(optimizer.init)(net.params)
    params, _, _, losses = run(
        net.params, opt_state, net.extra_variables,
        jax.random.PRNGKey(5), jnp.asarray(x_train), len(x_train))
    checksum = float(sum(jnp.abs(l).sum()
                         for l in jax.tree_util.tree_leaves(params)))
    return np.asarray(losses), checksum


def test_dp_training_matches_single_process(worker_results):
    losses, checksum = _single_process_reference()
    got = np.asarray(worker_results["dp_losses"])
    np.testing.assert_allclose(got, losses, rtol=2e-4)
    # params drift only by reduction order across 8 Adam steps
    np.testing.assert_allclose(worker_results["dp_param_checksum"],
                               checksum, rtol=1e-3)


def test_sweep_over_process_spanning_mesh(worker_results):
    # the distributed-mesh sweep inside the 2-process cluster must match
    # the mesh-free sweep run in the same cluster...
    np.testing.assert_allclose(worker_results["sweep_final_loss"],
                               worker_results["sweep_final_loss_nomesh"],
                               rtol=2e-4)
    # ...and the same sweep run single-process here
    res = sweep_lr(make_net, CASE["sweep_lrs"], make_x_train(),
                   shape=CASE["shape"], epochs=CASE["epochs"],
                   batch_size=CASE["batch_size"], T=CASE["T"], seed=3)
    np.testing.assert_allclose(worker_results["sweep_final_loss"],
                               res.final_loss, rtol=2e-4)
    assert "trial" in (worker_results["sweep_param_sharding"] or "")
    assert np.all(np.isfinite(worker_results["sweep_ssim"]))
    # the artifact path ran cross-process (collective gather on every
    # process, files written by process 0 only) and produced one
    # result.json per trial
    assert len(worker_results["sweep_artifacts_written"]) == len(
        CASE["sweep_lrs"])


def test_host_local_batch_and_replication(worker_results):
    """host_local_batch assembled the global dataset from per-process
    slices (verified by array equality inside the worker) and
    replicate_from_host round-tripped a host pytree."""
    x = make_x_train()
    np.testing.assert_allclose(worker_results["host_local_batch_sum"],
                               float(np.sum(np.asarray(x))), rtol=1e-5)
    assert worker_results["replicated_b"] == 2.5


def test_initialize_rejects_topology_without_coordinator(monkeypatch):
    """Explicit num_processes/process_id with no coordinator address must
    raise, not silently fall back to single-process (the other hosts
    would block forever waiting for this peer)."""
    from qiddm_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    with pytest.raises(ValueError, match="coordinator"):
        distributed.initialize(num_processes=8, process_id=3)
    # plain no-config stays a clean single-host False
    assert distributed.initialize() is False
