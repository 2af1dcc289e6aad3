"""Where do the w=20 training step's ~294 ms actually go?

Measures, each as pipelined device walls:
  * forward-only reupload_chain_wide (L=14, k=2)
  * value_and_grad step (fwd + custom-VJP adjoint bwd)
  * marginal cost of the bwd's three per-group ops in isolation
    (state reconstruct G^H, dG einsum 'bpxq,bpyq->xy', cotangent G^T)

Run: python tools/bench_wide_bwd_probe.py [--wires 20]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_wide_micro import timeit, timeit2  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wires", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--L", type=int, default=14)
    ap.add_argument("--k", type=int, default=2)
    args = ap.parse_args()
    w, B, L, k = args.wires, args.batch, args.L, args.k

    from qiddm_tpu.sim.engine import reupload_block
    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.wide import _offsets, group_gates, group_sizes

    weights = jax.random.normal(jax.random.PRNGKey(0),
                                (L, k, w, 3), jnp.float32) * 0.4
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, w))
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (B, w))

    def loss_fn(wt):
        out = reupload_block(x, wt, encode="rz", imprimitive="cz",
                             readout="expvalz")
        return jnp.mean((out - tgt) ** 2)

    fwd = jax.jit(loss_fn)
    step = jax.jit(lambda wt: jax.value_and_grad(loss_fn)(wt))

    tf = timeit(fwd, weights, reps=10)
    # time the full step via the loss output (grads stay on device)
    ts = timeit(lambda wt: step(wt)[0], weights, reps=10)
    print(f"w={w} L={L} k={k} B={B}:")
    print(f"  forward-only : {tf*1e3:8.2f} ms")
    print(f"  fwd+bwd step : {ts*1e3:8.2f} ms  (bwd ~ {(ts-tf)*1e3:.2f})")

    # --- marginal cost of each bwd per-group op ---------------------------
    sizes = group_sizes(w)
    offs = _offsets(sizes)

    @jax.jit
    def setup():
        r = jax.random.normal(jax.random.PRNGKey(0), (B, 2**w))
        i = jax.random.normal(jax.random.PRNGKey(9), (B, 2**w))
        mats = rot_matrix(*(jax.random.normal(jax.random.PRNGKey(t), (w,))
                            for t in range(3)))
        gs = group_gates(mats.astype(jnp.complex64), sizes)
        gp = tuple((jnp.real(g), jnp.imag(g)) for g in gs)
        return gp, r, i

    gparts, sr, si = setup()

    def dg_once(cr, ci, vr, vi, off, s):
        pre, post = 2**off, 2 ** (w - off - s)
        c_r = cr.reshape(B, pre, 2**s, post)
        c_i = ci.reshape(B, pre, 2**s, post)
        s_r = vr.reshape(B, pre, 2**s, post)
        s_i = vi.reshape(B, pre, 2**s, post)
        e = lambda a, b: jnp.einsum("bpxq,bpyq->xy", a, b,
                                    precision="highest")
        return e(c_r, s_r) + e(c_i, s_i), e(c_i, s_r) - e(c_r, s_i)

    for gi, (off, s) in enumerate(zip(offs, sizes)):
        def make(n, off=off, s=s):
            def chain(vr, vi):
                acc_r = acc_i = 0.0
                for t in range(n):
                    dgr, dgi = dg_once(vr * (1.0 + t), vi, vr, vi, off, s)
                    acc_r = acc_r + dgr
                    acc_i = acc_i + dgi
                return acc_r, acc_i
            return chain
        w1 = timeit2(jax.jit(make(1)), sr, si, reps=10)
        w8 = timeit2(jax.jit(make(8)), sr, si, reps=10)
        print(f"  dG einsum group{gi} (s={s}): wall1={w1*1e3:6.2f} "
              f"wall8={w8*1e3:6.2f} -> marginal {(w8-w1)/7*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
