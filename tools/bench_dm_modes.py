#!/usr/bin/env python
"""A/B the density-backend channel strategies on the real TPU and report
the noise-workload throughputs (VERDICT r2 item 7 evidence).

Measures, per mode ("perwire" closed forms vs "grouped" superoperator
contractions):
  * raw all-wires channel application (8 wires, batch 10, scanned x200)
  * the dm bench (QIDDM_PL_noise sampling under amplitude damping)
  * the vmapped 10-intensity sweep sampler (the actual noise-driver
    workload after the traced-strength rework)

Run ALONE on the chip (one TPU process at a time). Avoids ops the axon
backend marks UNIMPLEMENTED (no jnp.trace / eager complex math).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qiddm_tpu import config, nn  # noqa: E402
from qiddm_tpu.cli import common  # noqa: E402
from qiddm_tpu.cli.noise_common import _sample_intensities  # noqa: E402
from qiddm_tpu.diffusion import Diffusion  # noqa: E402
from qiddm_tpu.sim import channels as ch  # noqa: E402
from qiddm_tpu.sim import density as dm  # noqa: E402


def bench_raw(mode: str, wires=8, B=10, reps=200):
    config.set_dm_channel_mode(mode)
    d = 2**wires
    rng = np.random.default_rng(0)
    v = rng.normal(size=(B, d)) + 1j * rng.normal(size=(B, d))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rho0 = jnp.asarray(v[:, :, None] * v[:, None, :].conj(), jnp.complex64)

    @jax.jit
    def loop(rho):
        def body(r, _):
            return dm.apply_channel_all_wires(
                r, "amplitude_damping", 0.05) + rho0 * 0.01, None

        return jax.lax.scan(body, rho, None, length=reps)[0]

    np.asarray(loop(rho0))
    t0 = time.time()
    np.asarray(loop(rho0))
    return (time.time() - t0) * 1e6 / reps  # us/apply


def bench_dm_sampling(mode: str):
    config.set_dm_channel_mode(mode)
    import bench

    rec, detail = bench.bench_noise_dm_sampling()
    return rec["value"], detail


def bench_intensity_sweep(mode: str, n_int=10, batch=10, iters=15, reps=3):
    """The real noise-driver workload: ONE vmapped program sampling every
    intensity."""
    config.set_dm_channel_mode(mode)
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
    import argparse

    ap = argparse.ArgumentParser()
    # bench_raw (the synthetic scan microbench) is OPT-IN: on the axon
    # backend its program shape hits an UNIMPLEMENTED backend op and
    # wedges the TPU worker for ~an hour. The two real-workload benches
    # below are proven program shapes and run by default.
    ap.add_argument("--raw", action="store_true",
                    help="also run the raw all-wires channel microbench "
                         "(CPU or full TPU runtimes only — wedges axon)")
    args = ap.parse_args()
    out = {}
    if args.raw:
        for mode in ("perwire", "grouped"):
            out.setdefault("raw", {})[mode] = bench_raw(mode)
            print("raw", mode, out["raw"][mode], flush=True)
    for mode in ("perwire", "grouped"):
        v, detail = bench_dm_sampling(mode)
        sw, wall = bench_intensity_sweep(mode)
        out[mode] = {"dm_sample_images_per_sec": v,
                     "sweep_images_x_intensities_per_sec": round(sw, 1),
                     "sweep_wall_s": round(wall, 2)}
        print(mode, json.dumps(out[mode]), flush=True)
    p = pathlib.Path("results/dm_mode_ab.json")
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(out, indent=2))
    print(f"wrote {p}")


if __name__ == "__main__":
    main()
