"""Bisect the wide-kernel TPU compile failure (remote helper SIGKILL).

Compiles the fused fwd / bwd superstate kernels in isolation at
increasing chain depths and records compile wall / failure per case, so
the compile-memory blowup can be attributed (fwd vs bwd, depth scaling,
relayout count). AOT-compiles only (no execution).

Run: python tools/bench_wide_kernel_bisect.py [--cases fwd:2,fwd:14,...]
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

from qiddm_tpu.sim import pallas_wide_kernel as wk


def make_inputs(L, k, wires, B=1):
    dims, rests = wk._dims_rests()
    key = jax.random.PRNGKey(0)
    er = jax.random.normal(key, (B, dims[0], rests[0]), jnp.float32)
    ei = jax.random.normal(key, (B, dims[0], rests[0]), jnp.float32)
    gs = []
    for d in dims:
        gs += [jnp.zeros((L * k, d, d), jnp.float32)] * 2
    return (er, ei), tuple(gs)


def try_compile(fn, *args):
    t0 = time.time()
    try:
        jax.jit(fn).lower(*args).compile()
        return {"ok": True, "compile_s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "compile_s": round(time.time() - t0, 1),
                "err": str(e)[:200]}


def run_case(kind: str, L: int, k=2, wires=16):
    enc, gs = make_inputs(L, k, wires)

    if kind == "fwd":
        fn = lambda e, g: wk.wide_fwd_planes(e, g, L, k, wires)  # noqa: E731
        r = try_compile(fn, enc, gs)
    else:
        out = (enc[0], enc[1])
        ct = (enc[0], enc[1])
        fn = lambda o, c, e, g: wk.wide_bwd_planes(  # noqa: E731
            o, c, e, g, L, k, wires)
        r = try_compile(fn, out, ct, enc, gs)
    r.update(kind=kind, L=L, k=k, wires=wires)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="fwd:1,fwd:4,fwd:14,bwd:1,bwd:4,bwd:14")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    rows = []
    for case in args.cases.split(","):
        kind, L = case.split(":")
        r = run_case(kind, int(L))
        rows.append(r)
        print(json.dumps(r), flush=True)
    path = pathlib.Path(__file__).resolve().parent.parent / "results"
    path.mkdir(exist_ok=True)
    (path / "wide_kernel_bisect.json").write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
