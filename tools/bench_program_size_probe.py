"""Where do the primary training program's 14.2 MB of generated code
(and its 16+ s compile) come from?

Compiles the bench_qiddm_a multi-epoch program in several configurations
and reports generated-code size + compile wall for each:
  * full program, pallas on (the shipping route)
  * full program, pallas off (XLA gate path)
  * the fused fwd / bwd pallas kernels alone
  * a single train step (no epoch scan) — is the scan body deduplicated?

Run: python tools/bench_program_size_probe.py [--epochs 30]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _size_and_wall(lower_fn):
    t0 = time.time()
    lowered = lower_fn()
    trace_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        code = compiled.memory_analysis().generated_code_size_in_bytes
    except Exception:
        code = None
    return {"trace_s": round(trace_s, 2), "compile_s": round(compile_s, 2),
            "generated_code_bytes": code}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    from qiddm_tpu import config, data, nn
    from qiddm_tpu.diffusion import Diffusion
    import optax

    x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    x = x[y == 4]
    x = x[: int(len(x) * 0.8)]
    x_train = jnp.asarray(np.asarray(x)).reshape(len(x), -1)
    n_train = int(x_train.shape[0])
    optimizer = optax.adam(0.0459)

    def full_program(pallas: bool, epochs: int):
        config.set_use_pallas(pallas)
        net = nn.differN_noise(28, 9, 2, 0)
        diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
        params = net.params
        extra = net.extra_variables
        opt_state = optimizer.init(params)
        run_j = diff.make_multi_epoch_fn(optimizer, 10, 8, epochs)
        key = jax.random.PRNGKey(42)
        return lambda: run_j.lower(params, opt_state, extra, key, x_train,
                                   n_train=n_train)

    rows = {}
    rows["full_pallas_on"] = _size_and_wall(full_program(True, args.epochs))
    rows["full_pallas_off"] = _size_and_wall(full_program(False, args.epochs))
    rows["one_epoch_pallas_on"] = _size_and_wall(full_program(True, 1))

    # the two fused kernels alone (fwd and fwd+bwd), same shapes as the
    # bench row: w=9 (d=512), chain batch = batch*tau = 80, n_layers=L*k=18
    from qiddm_tpu.sim.pallas_gate_kernel import gate_chain_planes

    d, B, L, k, wires = 512, 80, 9, 2, 9
    pr = jnp.ones((d, B), jnp.float32)
    pi = jnp.zeros((d, B), jnp.float32)
    mats = jnp.tile(jnp.eye(2, dtype=jnp.complex64), (L * k, wires, 1, 1))

    def fwd_only():
        f = jax.jit(lambda pr, pi, m: gate_chain_planes(pr, pi, m, k, wires))
        return lambda: f.lower(pr, pi, mats)

    def fwd_bwd():
        def loss(m):
            o_r, o_i = gate_chain_planes(pr, pi, m, k, wires)
            return jnp.sum(o_r ** 2 + o_i ** 2)
        f = jax.jit(jax.grad(loss))
        return lambda: f.lower(mats)

    rows["kernel_fwd_only"] = _size_and_wall(fwd_only())
    rows["kernel_fwd_bwd"] = _size_and_wall(fwd_bwd())

    import json
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
