"""On-chip numerical parity: every fused Pallas route vs its XLA twin,
ON THE REAL TPU (Mosaic lowering included — interpret-mode CPU parity
cannot catch Mosaic-only bugs: precision flags, relayouts, roll/mask
lowerings).

For each fused route, runs the SAME computation through the Pallas
kernel and the pure-XLA path, compares forward values and weight
gradients, and fails loudly past tolerance. Writes
results/onchip_parity.json; exit 1 on any failure.

Routes covered:
  * gate_chain (rz/CZ re-uploading chain, probs + expvalz readouts)
  * ry_chain   (RY-encoded re-uploading chain)
  * sel_chain  (Qdense amplitude route, CNOT ring)
  * qnn_chain  (QNN rz/CZ chain with expvals)
  * dm_block   (fused density-matrix block vs composed-unitary sandwich)
  * amp_damp   (fused trajectory amplitude-damping pass vs the XLA loop)

The wide-regime superstate kernel is NOT here: it is default-off after
its on-chip A/B (results/wide_kernel_ab_w16.json carries its measured
loss drift, 1.5e-7).

Run (on the TPU): python tools/parity_onchip.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from qiddm_tpu import config
from qiddm_tpu.sim import engine

RTOL_VAL = 2e-4
RTOL_GRAD = 2e-3

RESULTS = []


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.max(np.abs(a)), np.max(np.abs(b)), 1e-12)
    return float(np.max(np.abs(a - b)) / scale)


def _check(name, fn_pallas, fn_xla, args, wrt=None):
    """Compare jitted fwd values and (optionally) grads wrt args[wrt]."""
    va = jax.jit(fn_pallas)(*args)
    vb = jax.jit(fn_xla)(*args)
    row = {"route": name, "fwd_rel_err": _rel(va, vb)}
    ok = row["fwd_rel_err"] <= RTOL_VAL
    if wrt is not None:
        la = jax.jit(jax.grad(lambda *a: jnp.sum(fn_pallas(*a) ** 2),
                              argnums=wrt))(*args)
        lb = jax.jit(jax.grad(lambda *a: jnp.sum(fn_xla(*a) ** 2),
                              argnums=wrt))(*args)
        row["grad_rel_err"] = _rel(la, lb)
        ok = ok and row["grad_rel_err"] <= RTOL_GRAD
    row["ok"] = bool(ok)
    RESULTS.append(row)
    print(json.dumps(row), flush=True)
    return ok


def main():
    dev = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]}", flush=True)
    if dev not in ("tpu", "axon"):
        print("NOT on TPU — this tool asserts Mosaic lowering; aborting",
              file=sys.stderr)
        return 2

    rng = np.random.default_rng(7)
    ok = True

    def reupload(pallas: bool, encode: str, readout: str, w: int):
        def f(x, wq):
            config.set_use_pallas(pallas)
            try:
                return engine.reupload_block(x, wq, encode=encode,
                                             imprimitive="cz",
                                             readout=readout)
            finally:
                config.set_use_pallas(True)
        return f

    for w, readout, encode in ((6, "probs", "rz"), (10, "expvalz", "rz"),
                               (6, "expvalz", "ry")):
        x = jnp.asarray(rng.uniform(-1, 1, (8, w)), jnp.float32)
        wq = jnp.asarray(rng.normal(size=(3, 2, w, 3)) * 0.4, jnp.float32)
        name = f"gate_chain_w{w}_{encode}_{readout}"
        ok &= _check(name, reupload(True, encode, readout, w),
                     reupload(False, encode, readout, w), (x, wq), wrt=1)

    # Qdense amplitude route (CNOT ring SEL chain kernel)
    from qiddm_tpu.sim.engine import qdense_circuit, qnn_circuit

    def qdense(pallas: bool):
        def f(x, wq):
            config.set_use_pallas(pallas)
            try:
                return qdense_circuit(x, wq, wires=8)
            finally:
                config.set_use_pallas(True)
        return f

    x = jnp.asarray(rng.uniform(0, 1, (11, 200)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(12, 8, 3)) * 0.4, jnp.float32)
    ok &= _check("sel_chain_qdense_w8_cnot", qdense(True), qdense(False),
                 (x, wq), wrt=1)

    def qnn(pallas: bool):
        def f(x, wq):
            config.set_use_pallas(pallas)
            try:
                return qnn_circuit(x, wq, encode="rz", imprimitive="cz")
            finally:
                config.set_use_pallas(True)
        return f

    x = jnp.asarray(rng.uniform(-1, 1, (9, 8)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(6, 8, 3)) * 0.4, jnp.float32)
    ok &= _check("qnn_chain_w8_cz", qnn(True), qnn(False), (x, wq), wrt=1)

    # dm block: fused gates kernel vs composed-unitary sandwich
    def dm(mode: str):
        def f(x, wq):
            config.set_dm_unitary_mode(mode)
            try:
                noise = engine.NoiseModel("amplitude_damping", 0.05, "encode")
                return engine.reupload_block(x, wq, encode="rz",
                                             imprimitive="cz", noise=noise,
                                             readout="expvalz")
            finally:
                config.set_dm_unitary_mode("gates")
        return f

    x = jnp.asarray(rng.uniform(-1, 1, (4, 6)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(2, 2, 6, 3)) * 0.4, jnp.float32)
    ok &= _check("dm_block_w6_amp_damp", dm("gates"), dm("matmul"),
                 (x, wq), wrt=1)

    # fused trajectory amplitude-damping pass vs the XLA loop
    from qiddm_tpu.sim.trajectories import _amp_damp_fused, _amp_damp_xla

    # complex64 NEVER crosses the axon tunnel (host<->device transfers of
    # complex arrays fail UNIMPLEMENTED, asynchronously — the error lands
    # on the NEXT op): the state goes up as two f32 planes, is assembled
    # in-jit, and the readout comes back as f32 per-amplitude probs.
    w = 10
    d = 2 ** w
    sr_ = rng.normal(size=(64, d))
    si_ = rng.normal(size=(64, d))
    nrm = np.sqrt((sr_ ** 2 + si_ ** 2).sum(axis=1, keepdims=True))
    st_re = jnp.asarray(np.asarray(sr_ / nrm, np.float32))
    st_im = jnp.asarray(np.asarray(si_ / nrm, np.float32))
    u = jnp.asarray(np.asarray(rng.uniform(0, 1, (w, 64)), np.float32))
    g = jnp.asarray(np.full((1,), 0.07, np.float32))

    def traj(fused: bool):
        def f(sr, si, uu, gg):
            s = jax.lax.complex(sr, si)
            out = (_amp_damp_fused(s, uu, gg[0], 128, False) if fused
                   else _amp_damp_xla(s, uu, gg[0]))
            return jnp.abs(out) ** 2
        return f

    ok &= _check("traj_amp_damp_w10", traj(True), traj(False),
                 (st_re, st_im, u, g), wrt=3)

    path = pathlib.Path(__file__).resolve().parent.parent / "results"
    path.mkdir(exist_ok=True)
    (path / "onchip_parity.json").write_text(json.dumps(
        {"device": dev, "rtol_val": RTOL_VAL, "rtol_grad": RTOL_GRAD,
         "routes": RESULTS, "all_ok": bool(ok)}, indent=1))
    print(f"{'ALL PARITY OK' if ok else 'PARITY FAILURE'} "
          f"({len(RESULTS)} routes) -> results/onchip_parity.json",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
