#!/usr/bin/env python
"""A/B the density-backend SEL strategies on the real TPU (VERDICT r2
item 7 evidence, round 3).

Modes (config.set_dm_unitary_mode + use_pallas):
  * "gates" (default): the fully-fused Pallas dm-block kernel
    (sim/pallas_dm_kernel.py) where eligible, two-sided gate chains
    otherwise;
  * "gates_xla": the same gate-level route with Pallas disabled;
  * "matmul": composed per-layer unitaries, rho sandwiched between two
    batched complex matmuls (the round-2 path).

Per mode it measures the dm bench (QIDDM_PL_noise sampling under
amplitude damping) and the 10-intensity sweep sampler (the real
noise-driver workload). Run ALONE on the chip. First run pays Mosaic
compile walls (~4 min per program shape); the persistent compilation
cache absorbs them on reruns.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402

from qiddm_tpu import config, nn  # noqa: E402
from qiddm_tpu.cli import common  # noqa: E402
from qiddm_tpu.cli.noise_common import _sample_intensities  # noqa: E402
from qiddm_tpu.diffusion import Diffusion  # noqa: E402


def set_mode(mode: str):
    if mode == "gates":
        config.set_dm_unitary_mode("gates")
        config.set_use_pallas(True)
    elif mode == "gates_xla":
        config.set_dm_unitary_mode("gates")
        config.set_use_pallas(False)
    elif mode == "matmul":
        config.set_dm_unitary_mode("matmul")
        config.set_use_pallas(True)
    else:
        raise ValueError(mode)


def bench_dm_sampling():
    import bench

    rec, detail = bench.bench_noise_dm_sampling()
    return rec["value"], detail


def bench_intensity_sweep(n_int=10, batch=10, iters=15, reps=3):
    net = common.with_noise(nn.QIDDM_PL_noise(784, 8, 6, 2, 0), 2, 0.05)
    diff = Diffusion(net=net, prediction_goal="data", shape=(28, 28))
    first_x = jax.random.uniform(
        jax.random.PRNGKey(3), (batch, 1, 28, 28)) * 0.75 + 0.5
    ints = [0.01 * i for i in range(n_int)]
    np.asarray(_sample_intensities(diff, first_x, iters, ints))  # warm
    t0 = time.time()
    for _ in range(reps):
        out = _sample_intensities(diff, first_x, iters, ints)
    np.asarray(out)
    wall = (time.time() - t0) / reps
    return n_int * batch / wall, wall


def main():
    modes = sys.argv[1:] or ["gates", "matmul"]
    out = {}
    for mode in modes:
        set_mode(mode)
        v, detail = bench_dm_sampling()
        sw, wall = bench_intensity_sweep()
        out[mode] = {"dm_sample_images_per_sec": v,
                     "sweep_images_x_intensities_per_sec": round(sw, 1),
                     "sweep_wall_s": round(wall, 2)}
        print(mode, json.dumps(out[mode]), flush=True)
    set_mode("gates")
    p = pathlib.Path("results/dm_unitary_ab.json")
    p.parent.mkdir(parents=True, exist_ok=True)
    prev = json.loads(p.read_text()) if p.exists() else {}
    prev.update(out)
    p.write_text(json.dumps(prev, indent=2))
    print(f"wrote {p}")


if __name__ == "__main__":
    main()
