"""Which parts of the primary train-step program carry the 14.2 MB of
generated code?  Compiles sub-programs and reports generated-code size:

  * net.apply forward alone
  * value_and_grad of the chain loss (one step, no optimizer)
  * the full optimizer step (no epoch scan)
  * one reupload block fwd / fwd+bwd (N=1 instead of the model's N=2)

Run: python tools/bench_codegen_parts.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _size(lower_fn):
    t0 = time.time()
    compiled = lower_fn().compile()
    wall = time.time() - t0
    try:
        code = compiled.memory_analysis().generated_code_size_in_bytes
    except Exception:
        code = None
    return {"compile_s": round(wall, 2), "generated_code_bytes": code}


def main():
    from qiddm_tpu import data, nn
    from qiddm_tpu.diffusion import Diffusion
    import optax

    x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    x = x[y == 4]
    x = x[: int(len(x) * 0.8)]
    x_train = jnp.asarray(np.asarray(x)).reshape(len(x), -1)
    optimizer = optax.adam(0.0459)

    rows = {}
    for n_blocks, tag in ((2, "n2"), (1, "n1")):
        net = nn.differN_noise(28, 9, n_blocks, 0)
        diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
        params, extra = net.params, net.extra_variables
        key = jax.random.PRNGKey(0)
        xb = x_train[:8]

        # forward only (the tau-expanded batch the loss sees: B*tau rows)
        big = jnp.tile(xb, (10, 1)).reshape(80, 1, 28, 28)
        fwd = jax.jit(lambda p, e, v: net.module.apply(
            {"params": p, **e}, v, train=True,
            mutable=net.mutable_collections))
        rows[f"{tag}_fwd"] = _size(lambda: fwd.lower(params, extra, big))

        # loss + grad
        def loss_fn(p):
            loss, (_, _, nv) = diff._chain_loss(p, extra, key, xb, 10)
            return loss, nv

        vag = jax.jit(lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))
        rows[f"{tag}_loss_grad"] = _size(lambda: vag.lower(params))

        # full optimizer step
        opt_state = optimizer.init(params)

        def step(p, s):
            (l, nv), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, s = optimizer.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        stj = jax.jit(step)
        rows[f"{tag}_opt_step"] = _size(lambda: stj.lower(params, opt_state))

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
