"""Narrow-regime route A/B: is the grouped-Kronecker MXU chain worth it
at 6-12 wires, where the fused Pallas kernels currently own the default?

The wide route (sim/wide.py) was built for, and measured in, the 13-20
wire regime (15.6x per sublayer at w=20 vs the per-gate adjoint walk).
But nothing says its 2-3 matmul passes per sublayer can't also beat the
``wires`` elementwise passes — or the fused Pallas kernel — at the
reference's own widths (6-10 wires, reference nn/qdense.py:25), where
the whole state fits in VMEM and every route is dispatch-bound. This
tool measures full train steps (fwd+bwd+update on reupload_block, the
suite's unit) per route and width so the config default is set by data:

  pallas   config defaults (fused chain kernel at w <= pallas_max_wires)
  wide     grouped-Kronecker forced (set_use_pallas(False), wide "on")
  pergate  per-gate adjoint chain  (pallas off, wide "off", adjoint "on")

Run on the real chip:
  python tools/bench_narrow_route_ab.py [--wires 6 8 10 11 12] [--steps 100]
Writes results/narrow_route_ab.json with per-(width, route) steps/s and
final-loss drift vs the pergate reference route.
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
import numpy as np

from qiddm_tpu import config as _config
from qiddm_tpu.sim.engine import reupload_block


def _route_config(route: str):
    """Apply the global routing toggles for one route; return a restore fn."""
    saved = (_config.use_pallas(), _config.wide_mode(), _config.adjoint_mode(),
             _config.pallas_max_wires())

    def restore():
        _config.set_use_pallas(saved[0])
        _config.set_wide_mode(saved[1])
        _config.set_adjoint_mode(saved[2])
        _config.set_pallas_max_wires(saved[3])

    if route == "pallas":
        _config.set_use_pallas(True)
        _config.set_wide_mode("off")
        _config.set_adjoint_mode("auto")
    elif route == "wide":
        _config.set_use_pallas(False)
        _config.set_wide_mode("on")
        _config.set_adjoint_mode("auto")
    elif route == "pergate":
        _config.set_use_pallas(False)
        _config.set_wide_mode("off")
        _config.set_adjoint_mode("on")
    else:
        raise ValueError(route)
    return restore


def bench_route(route: str, wires: int, L: int, k: int, batch: int,
                steps: int) -> dict:
    restore = _route_config(route)
    try:
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

        run = jax.jit(lambda w: jax.lax.scan(step, w, None, length=steps))
        t0 = time.time()
        jax.block_until_ready(run(w0)[1])          # compile + warmup
        compile_s = time.time() - t0
        t0 = time.time()
        _, losses = run(w0)
        losses = np.asarray(losses)                # fetch == sync
        wall = time.time() - t0
        return {
            "route": route,
            "steps_per_sec": round(steps / wall, 1),
            "ms_per_step": round(1e3 * wall / steps, 3),
            "compile_s": round(compile_s, 1),
            "loss_first": float(losses[0]),
            "loss_last": float(losses[-1]),
        }
    finally:
        restore()


def bench_route_qdense(route: str, wires: int, depth: int, batch: int,
                       steps: int) -> dict:
    """Same A/B on the Qdense path (amplitude embed -> SEL -> probs,
    sim/engine.py::qdense_circuit) — the other production chain shape."""
    from qiddm_tpu.sim.engine import qdense_circuit

    restore = _route_config(route)
    try:
        w0 = jax.random.normal(jax.random.PRNGKey(0),
                               (depth, wires, 3), jnp.float32) * 0.4
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 2 ** wires))
        tgt = jax.random.uniform(jax.random.PRNGKey(2), (batch, 2 ** wires))

        def loss_fn(w):
            out = qdense_circuit(x, w, wires=wires)
            return jnp.mean((out - tgt) ** 2)

        def step(w, _):
            loss, g = jax.value_and_grad(loss_fn)(w)
            return w - 0.01 * g, loss

        run = jax.jit(lambda w: jax.lax.scan(step, w, None, length=steps))
        t0 = time.time()
        jax.block_until_ready(run(w0)[1])
        compile_s = time.time() - t0
        t0 = time.time()
        _, losses = run(w0)
        losses = np.asarray(losses)
        wall = time.time() - t0
        return {
            "route": route, "kind": "qdense",
            "steps_per_sec": round(steps / wall, 1),
            "ms_per_step": round(1e3 * wall / steps, 3),
            "compile_s": round(compile_s, 1),
            "loss_first": float(losses[0]),
            "loss_last": float(losses[-1]),
        }
    finally:
        restore()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wires", type=int, nargs="+",
                    default=[6, 8, 10, 11, 12])
    ap.add_argument("--qdense", action="store_true",
                    help="bench the amplitude-embed SEL chain instead of "
                         "the re-uploading block")
    ap.add_argument("--L", type=int, default=14)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--routes", nargs="+",
                    default=["pergate", "wide", "pallas"])
    ap.add_argument("--skip-pallas-above", type=int, default=10,
                    help="skip the pallas route above this width (Mosaic "
                         "compile is 2-14 min at w=11-12; measured numbers "
                         "for those widths are in config.py:188-196)")
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} L={args.L} k={args.k} "
          f"B={args.batch} steps={args.steps}", flush=True)
    out = {"config": vars(args), "backend": jax.default_backend(), "rows": []}
    for w in args.wires:
        ref_loss = None
        for route in args.routes:
            if route == "pallas" and w > args.skip_pallas_above:
                continue
            if args.qdense:
                r = bench_route_qdense(route, w, args.L, args.batch,
                                       args.steps)
            else:
                r = bench_route(route, w, args.L, args.k, args.batch,
                                args.steps)
            r["wires"] = w
            if route == "pergate":
                ref_loss = r["loss_last"]
            if ref_loss is not None:
                r["loss_drift_vs_pergate"] = abs(r["loss_last"] - ref_loss)
            out["rows"].append(r)
            print(f"w={w:2d} {route:8s} {r['steps_per_sec']:8.1f} steps/s "
                  f"({r['ms_per_step']:7.3f} ms/step, compile "
                  f"{r['compile_s']:5.1f}s) loss_last={r['loss_last']:.6f}",
                  flush=True)

    path = pathlib.Path(__file__).resolve().parents[1] / "results"
    path.mkdir(exist_ok=True)
    suffix = "" if args.batch == 8 else f"_b{args.batch}"
    name = (f"narrow_route_ab_qdense{suffix}.json" if args.qdense
            else f"narrow_route_ab{suffix}.json")
    (path / name).write_text(json.dumps(out, indent=1))
    print(f"wrote {path / name}")


if __name__ == "__main__":
    main()
