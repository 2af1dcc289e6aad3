#!/usr/bin/env python
"""Measure the chip's practical elementwise-f32 ceiling (VPU roofline).

The statevector gate chain is elementwise complex arithmetic on
VMEM-resident planes — MXU peak is the wrong yardstick for it (DESIGN.md
roofline section). This microbenchmark measures the RIGHT yardstick: a
Pallas kernel that does nothing but chained fused multiply-adds on
(d, B)-shaped f32 planes of the same geometry the gate kernels use,
entirely in VMEM. Whatever GFLOP/s it achieves is the practical VPU
ceiling for that shape; DESIGN.md cites the gate chain's achieved fraction
of it.

Usage: python tools/vpu_ceiling.py [--d 1024] [--batch 80] [--iters 4096]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fma_kernel(iters: int, chains: int, x_ref, y_ref, o_ref):
    """iters x chains FMAs per element on one VMEM-resident plane.

    chains=1 is a single serial dependency chain — latency-bound, the
    floor of what dependent elementwise code achieves. chains=4 runs four
    independent accumulators so the VPU can pipeline — the throughput
    ceiling. The gate kernels sit between the two (each gate apply has
    independent real/imag/partner streams)."""
    y = y_ref[:]

    def body(i, accs):
        # data-dependent coefficient defeats constant folding; 1 FMA each
        return tuple(a * 1.0000001 + y for a in accs)

    accs = jax.lax.fori_loop(
        0, iters, body, tuple(x_ref[:] * (1.0 + 0.1 * c)
                              for c in range(chains)))
    out = accs[0]
    for a in accs[1:]:
        out = out + a
    o_ref[:] = out


def measure(d: int, batch: int, iters: int, chains: int = 1,
            reps: int = 20) -> dict:
    x = jax.random.uniform(jax.random.PRNGKey(0), (d, batch), jnp.float32)
    y = jax.random.uniform(jax.random.PRNGKey(1), (d, batch), jnp.float32)
    kern = functools.partial(_fma_kernel, iters, chains)
    f = jax.jit(lambda x, y: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, batch), jnp.float32),
    )(x, y))
    np.asarray(f(x, y))  # compile + warmup
    t0 = time.time()
    for _ in range(reps):
        out = f(x, y)
    np.asarray(out)
    wall = (time.time() - t0) / reps
    flops = 2.0 * d * batch * iters * chains
    return {"d": d, "batch": batch, "iters": iters, "chains": chains,
            "wall_us": round(wall * 1e6, 1),
            "gflops": round(flops / wall / 1e9, 1)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=80)  # B*tau chain pairs
    ap.add_argument("--iters", type=int, default=4096)
    args = ap.parse_args(argv)
    # the gate-kernel geometry (d on sublanes, batch on lanes) and a
    # lane-saturating 128 batch; serial chain (floor) plus 4 and 8
    # independent chains (the throughput envelope) each
    for b in sorted({args.batch, 128}):
        for chains in (1, 4, 8):
            rec = measure(args.d, b, args.iters, chains)
            print(rec)


if __name__ == "__main__":
    main()
