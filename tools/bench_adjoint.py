"""A/B adjoint-mode differentiation (sim/adjoint.py) vs plain autodiff on
the wide gate-level re-uploading path: compile-time memory analysis (the
autodiff residuals are the ceiling — O(L k w) statevectors vs O(1)) and a
timed fwd+bwd step per wire count.

The memory numbers come from XLA's own compiled-program analysis
(``compiled.memory_analysis().temp_size_in_bytes``), so they are valid on
any backend; the timings matter on the TPU.

Usage: python tools/bench_adjoint.py [B] [L] [k] [steps] [wires ...]
Writes results/adjoint_ab.json.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from qiddm_tpu import config, sim


def one_config(B, w, L, k, steps, mode):
    rng = np.random.default_rng(7)
    wq = jnp.asarray(rng.normal(size=(L, k, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(rng.normal(size=(B, w)), jnp.float32)
    coeff = jnp.asarray(rng.normal(size=(B, w)), jnp.float32)

    def loss(wq, xe):
        out = sim.reupload_block(xe, wq, imprimitive="cz",
                                 readout="expvalz")
        return jnp.sum(coeff * out)

    config.set_adjoint_mode(mode)
    try:
        step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        lowered = step.lower(wq, xe)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        rec = {"temp_mb": round(mem.temp_size_in_bytes / 2**20, 2),
               "output_mb": round(mem.output_size_in_bytes / 2**20, 2)}
        v, g = step(wq, xe)
        jax.block_until_ready(g)
        t0 = time.time()
        for _ in range(steps):
            v, g = step(wq, xe)
        jax.block_until_ready(g)
        rec["fwd_bwd_ms"] = round((time.time() - t0) / steps * 1e3, 3)
        rec["loss"] = float(v)
        rec["grad_norm"] = float(jnp.linalg.norm(g[0]))
    finally:
        config.set_adjoint_mode("auto")
    return rec


def run(B=11, L=14, k=2, steps=30, wire_list=(12, 14, 16)):
    out = {"config": {"B": B, "L": L, "k": k, "steps": steps,
                      "backend": jax.default_backend()}}
    for w in wire_list:
        row = {}
        for mode in ("off", "on"):
            row["adjoint_" + mode] = one_config(B, w, L, k, steps, mode)
            print(f"w={w} adjoint={mode}: {row['adjoint_' + mode]}",
                  file=sys.stderr)
        la = row["adjoint_on"]["loss"]
        lb = row["adjoint_off"]["loss"]
        assert abs(la - lb) < 1e-3 * max(1.0, abs(lb)), (la, lb)
        row["temp_ratio"] = round(
            row["adjoint_off"]["temp_mb"]
            / max(row["adjoint_on"]["temp_mb"], 1e-9), 1)
        out[f"wires_{w}"] = row
    return out


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    if len(args) > 4:
        res = run(*args[:4], wire_list=tuple(args[4:]))
    else:
        res = run(*args)
    with open("results/adjoint_ab.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
