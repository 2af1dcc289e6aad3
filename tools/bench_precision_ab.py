"""A/B: matmul precision on the MXU serving route (composed-unitary path).

``config.set_matmul_precision("highest")`` (the default) pins fp32
accumulation on every simulator contraction for parity;
``"default"`` lets the TPU run its native bfloat16 passes. This measures
the flagship batched sampler (batch >= 2**wires, the serving regime where
every quantum block is a batched MXU matmul) under both settings and the
resulting output drift, writing results/precision_ab.json.

Run on the TPU: ``python tools/bench_precision_ab.py``.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def run(batch=4096, iters=15, reps=5):
    import jax
    import numpy as np

    from qiddm_tpu import config, nn
    from qiddm_tpu.diffusion import Diffusion

    key = jax.random.PRNGKey(7)
    first_x = jax.random.uniform(key, (batch, 1, 28, 28)) * 0.75 + 0.5

    out = {}
    imgs = {}
    for prec in ("highest", "default"):
        config.set_matmul_precision(prec)
        net = nn.QIDDM_LL_noise(784, 6, 14, 2, 0)
        diff = Diffusion(net=net, prediction_goal="data", shape=(28, 28))
        y = diff.sample(first_x=first_x, n_iters=iters, only_last=True)
        imgs[prec] = np.asarray(y)
        # pipelined timing with a scalar sync (see bench._median_wall):
        # full-array fetches measure the axon tunnel, not the chip
        walls = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                y = diff.sample(first_x=first_x, n_iters=iters,
                                only_last=True)
            float(y.sum())
            walls.append((time.time() - t0) / reps)
        wall = sorted(walls)[1]
        out[prec] = {"images_per_sec": round(batch / wall, 1),
                     "wall_ms": round(wall * 1e3, 1)}
    config.set_matmul_precision("highest")

    drift = np.abs(imgs["default"] - imgs["highest"])
    out["abs_drift_max"] = float(drift.max())
    out["abs_drift_mean"] = float(drift.mean())
    out["speedup"] = round(out["default"]["images_per_sec"]
                           / out["highest"]["images_per_sec"], 2)
    out["config"] = {"batch": batch, "iters": iters, "reps": reps,
                     "model": "QIDDM_LL_noise(784,6,14,2)"}
    import jax

    out["device"] = jax.devices()[0].platform
    return out


if __name__ == "__main__":
    res = run()
    print(json.dumps(res, indent=2))
    p = pathlib.Path(__file__).resolve().parents[1] / "results"
    p.mkdir(exist_ok=True)
    (p / "precision_ab.json").write_text(json.dumps(res, indent=2))
    print(f"wrote {p / 'precision_ab.json'}")
