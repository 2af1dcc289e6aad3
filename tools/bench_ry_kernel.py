"""A/B the fused RY-chain Pallas kernel vs the per-layer-unitary XLA route
on the real chip: QIDDM_PL_noise1's training-shape workload (expanded batch
B = bs*(tau+1) < dim, RY re-uploading encode, expval readout).

Usage: python tools/bench_ry_kernel.py [B] [wires] [L] [steps]
Writes results/ry_kernel_ab.json.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from qiddm_tpu import config, sim


def run(B=11, w=6, L=14, k=2, steps=200):
    rng = np.random.default_rng(5)
    wq = jnp.asarray(rng.normal(size=(L, k, w, 3)) * 0.4, jnp.float32)
    xe = jnp.asarray(rng.normal(size=(B, w)), jnp.float32)
    coeff = jnp.asarray(rng.normal(size=(B, w)), jnp.float32)

    def loss(wq, xe):
        out = sim.reupload_block(xe, wq, encode="ry", imprimitive="cz",
                                 readout="expvalz")
        return jnp.sum(coeff * out)

    out = {}
    for mode, pallas_on in (("pallas_ry_kernel", True),
                            ("xla_layer_unitaries", False)):
        config.set_use_pallas(pallas_on)
        # a FRESH jit per mode: jax.jit caches on abstract args only and
        # never retraces on the config global, so a shared step object
        # would run the first-traced (Pallas) program for both arms
        step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        v, g = step(wq, xe)
        jax.block_until_ready(g)
        t0 = time.time()
        for _ in range(steps):
            v, g = step(wq, xe)
        jax.block_until_ready(g)
        wall = (time.time() - t0) / steps
        out[mode] = {"fwd_bwd_ms": round(wall * 1e3, 3),
                     "loss": float(v),
                     "grad_norm": float(jnp.linalg.norm(g[0]))}
        print(mode, out[mode], file=sys.stderr)
    config.set_use_pallas(True)
    out["config"] = {"B": B, "wires": w, "L": L, "k": k, "steps": steps,
                     "backend": jax.default_backend()}
    la, lb = out["pallas_ry_kernel"]["loss"], out["xla_layer_unitaries"]["loss"]
    assert abs(la - lb) < 1e-3 * max(1.0, abs(lb)), (la, lb)
    return out


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    res = run(*args)
    with open("results/ry_kernel_ab.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
