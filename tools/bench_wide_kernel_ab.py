"""On-chip A/B: fused VMEM-resident wide kernel vs XLA grouped chain.

Same training step as bench.py::bench_wide_reupload (fwd+bwd+update,
rz/cz re-uploading block) at the suite's wide configs, run once with
config.wide_kernel_mode "off" (the XLA grouped-Kronecker chain, r4
baseline) and once "auto" (the fused kernel, sim/pallas_wide_kernel.py).
Reports steps/s, compile wall, and loss-trajectory agreement; writes
results/wide_kernel_ab_w{wires}.json.

Run: python tools/bench_wide_kernel_ab.py [--wires 20] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from qiddm_tpu import config
from qiddm_tpu.sim.engine import reupload_block


def _salient_error(msg: str) -> str:
    """Pull the informative lines out of an axon remote-compile error (the
    raw text leads with kilobytes of ANSI terminal log preamble)."""
    keep = [ln for ln in msg.splitlines()
            if any(s in ln for s in ("Ran out of memory", "vmem", "ERROR",
                                     "error:", "RESOURCE_EXHAUSTED"))
            and "\x1b[2m" not in ln]
    return (" | ".join(keep)[:600]) if keep else msg[:600]


def run_case(wires: int, L: int, k: int, batch: int, steps: int,
             mode: str, scan: bool):
    try:
        return _run_case(wires, L, k, batch, steps, mode, scan)
    except Exception as e:  # compile OOM / Mosaic failure: record, not crash
        return {"mode": mode, "ok": False, "err": _salient_error(str(e))}


def _run_case(wires: int, L: int, k: int, batch: int, steps: int,
              mode: str, scan: bool):
    config.set_wide_kernel_mode(mode)
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

    t0 = time.time()
    if scan:
        run = jax.jit(lambda w: jax.lax.scan(step, w, None, length=steps))
        jax.block_until_ready(run(w0)[1])
        compile_s = time.time() - t0
        t0 = time.time()
        _, losses = run(w0)
        losses = [float(v) for v in losses]
        wall = time.time() - t0
    else:
        step_j = jax.jit(lambda w: step(w, None))
        w, l0 = step_j(w0)
        jax.block_until_ready(l0)
        compile_s = time.time() - t0
        t0 = time.time()
        losses = []
        for _ in range(steps):
            w, loss = step_j(w)
            losses.append(loss)
        losses = [float(jax.block_until_ready(v)) for v in losses]
        wall = time.time() - t0
    return {
        "mode": mode,
        "steps_per_sec": round(steps / wall, 2),
        "ms_per_step": round(1e3 * wall / steps, 2),
        "compile_s": round(compile_s, 1),
        "loss_first": losses[0],
        "loss_last": losses[-1],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wires", type=int, default=20)
    ap.add_argument("--L", type=int, default=14)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--scan", action="store_true",
                    help="scan all steps into one program")
    ap.add_argument("--mode", default=None, choices=("off", "auto", "on"),
                    help="run a single mode only (fresh-process probe; "
                    "no A/B file is written)")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    rows = []
    for mode in ((args.mode,) if args.mode else ("off", "auto")):
        r = run_case(args.wires, args.L, args.k, args.batch, args.steps,
                     mode, args.scan)
        rows.append(r)
        print(json.dumps(r), flush=True)
    if args.mode:
        return
    out = {"config": vars(args), "xla": rows[0], "kernel": rows[1]}
    if rows[0].get("ok", True) and rows[1].get("ok", True):
        drift = abs(rows[0]["loss_last"] - rows[1]["loss_last"])
        speedup = (rows[1]["steps_per_sec"]
                   / max(rows[0]["steps_per_sec"], 1e-9))
        out.update(speedup=round(speedup, 2), loss_last_drift=drift)
        print(json.dumps({"speedup": out["speedup"],
                          "loss_last_drift": drift}))
    path = pathlib.Path(__file__).resolve().parent.parent / "results"
    path.mkdir(exist_ok=True)
    (path / f"wide_kernel_ab_w{args.wires}.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
