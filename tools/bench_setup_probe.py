"""Partition the primary bench row's setup time into trace / compile(or
cache load) / first-execution (device program load) / steady-state.

VERDICT r3 item 4 forensics: the primary program's persistent-cache
entry is ~40 MB, and a cache HIT showed setup anywhere from 4.0 s to
79.5 s across fresh processes on a quiescent host — this probe says
which stage swings (the suspect is first-execution: shipping the
compiled program to the device through the axon tunnel).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    from qiddm_tpu import data, nn
    from qiddm_tpu.diffusion import Diffusion
    import optax

    t = {}
    t0 = time.time()
    x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    x = x[y == 4]
    x = x[: int(len(x) * 0.8)]
    net = nn.differN_noise(28, 9, 2, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    t["build"] = time.time() - t0

    import jax.numpy as jnp

    x_train = jnp.asarray(np.asarray(x)).reshape(len(x), -1)
    n_train = int(x_train.shape[0])
    optimizer = optax.adam(0.0459)
    params = diff.net.params
    extra = diff.net.extra_variables
    opt_state = optimizer.init(params)
    run_j = diff.make_multi_epoch_fn(optimizer, 10, 8, 30)
    key = jax.random.PRNGKey(42)

    t0 = time.time()
    lowered = run_j.lower(params, opt_state, extra, key, x_train,
                          n_train=n_train)
    t["trace+lower"] = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t["compile_or_cache_load"] = time.time() - t0
    t0 = time.time()
    out = compiled(params, opt_state, extra, key, x_train)
    np.asarray(out[3])
    t["first_exec"] = time.time() - t0
    t0 = time.time()
    out = compiled(params, opt_state, extra, key, x_train)
    np.asarray(out[3])
    t["steady_exec"] = time.time() - t0
    try:
        mem = compiled.memory_analysis()
        t["exe_bytes_generated_code"] = getattr(
            mem, "generated_code_size_in_bytes", None)
    except Exception:
        pass
    for k, v in t.items():
        if isinstance(v, float):
            print(f"{k:>24}: {v:.2f}s")
        else:
            print(f"{k:>24}: {v}")


if __name__ == "__main__":
    main()
