"""A/B: host-looped steps vs one lax.scan over steps for the wide
(16-wire) training row.

bench.py's wide rows host-loop a single jitted step because the w=20
scan compile is pathological (bench.py:316-318). At w=16 the measured
step wall (~28 ms) sits ~6x above the HBM/MXU model (~5 ms,
DESIGN.md wide-regime roofline) — hypothesis: the per-step dispatch
through the axon tunnel is serial and dominates at small plane sizes.
If a scan-over-steps program compiles cleanly at w=16 and runs the same
math materially faster, the gap is dispatch, not device work, and the
bench row should scan.

Usage: python tools/bench_wide_scan_ab.py [--wires 16] [--steps 50]
Writes results/wide_scan_ab.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wires", type=int, default=16)
    ap.add_argument("--L", type=int, default=14)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args(argv)
    wires, L, k, batch, steps = (args.wires, args.L, args.k, args.batch,
                                 args.steps)

    from qiddm_tpu.sim.engine import reupload_block

    kw = jax.random.PRNGKey(0)
    w0 = jax.random.normal(kw, (L, k, wires, 3), jnp.float32) * 0.4
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, wires))
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (batch, wires))

    def loss_fn(w):
        out = reupload_block(x, w, encode="rz", imprimitive="cz",
                             readout="expvalz")
        return jnp.mean((out - tgt) ** 2)

    def step(w, _):
        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.01 * g, loss

    # --- A: host loop over one jitted step (bench.py's current shape) ---
    step_j = jax.jit(lambda w: step(w, None))
    w, first = step_j(w0)
    float(first.sum())  # compile+warm
    t0 = time.time()
    losses_a = []
    for _ in range(steps):
        w, loss = step_j(w)
        losses_a.append(loss)
    losses_a = [float(np.asarray(l)) for l in losses_a]
    wall_a = time.time() - t0

    # --- B: ONE program scanning all steps --------------------------------
    @jax.jit
    def run(w):
        return jax.lax.scan(step, w, None, length=steps)

    t0 = time.time()
    w_b, losses_b = run(w0)
    losses_b0 = np.asarray(losses_b)
    compile_b = time.time() - t0
    t0 = time.time()
    w_b, losses_b = run(w0)
    losses_b = np.asarray(losses_b)
    wall_b = time.time() - t0

    # same math: step 1 of A ran from a warmed w (one extra step), so
    # compare B's trace against a fresh A-chain loss sequence
    rec = {
        "wires": wires, "L": L, "k": k, "batch": batch, "steps": steps,
        "host_loop_steps_per_s": round(steps / wall_a, 1),
        "scan_steps_per_s": round(steps / wall_b, 1),
        "scan_compile_s": round(compile_b, 1),
        "speedup": round(wall_a / wall_b, 2),
        "loss_first_last_hostloop": [losses_a[0], losses_a[-1]],
        "loss_first_last_scan": [float(losses_b[0]), float(losses_b[-1])],
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "results"
    out.mkdir(exist_ok=True)
    path = out / f"wide_scan_ab_w{wires}.json"
    path.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
