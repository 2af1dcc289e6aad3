"""Marginal device cost of one group apply: chain N applies in ONE
program and fit wall(N) = overhead + N * marginal.

The single-op probes (bench_wide_group_probe.py) bundle per-program
dispatch/launch overhead into every number — chaining isolates the true
per-apply device time, which is what a fused/better formulation could
actually save.

Run: python tools/bench_wide_slope_probe.py [--wires 20]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_wide_micro import timeit2  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wires", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    w, B = args.wires, args.batch

    from qiddm_tpu.sim.adjoint import _ring_tables
    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.wide import _offsets, group_gates, group_sizes

    sizes = group_sizes(w)
    offs = _offsets(sizes)
    _, tab_np, _ = _ring_tables(1, 1, w, "cz", False)
    sign = np.asarray(tab_np)[0, 0]

    @jax.jit
    def setup():
        r = jax.random.normal(jax.random.PRNGKey(0), (B, 2**w))
        i = jax.random.normal(jax.random.PRNGKey(9), (B, 2**w))
        n = jnp.sqrt(r * r + i * i).sum(1, keepdims=True)
        mats = rot_matrix(*(jax.random.normal(jax.random.PRNGKey(t), (w,))
                            for t in range(3)))
        gs = group_gates(mats.astype(jnp.complex64), sizes)
        gp = tuple((jnp.real(g), jnp.imag(g)) for g in gs)
        return gp, r / n, i / n

    gparts, sr, si = setup()

    def apply_planar(vr, vi, gr, gi_, off, s, prec):
        pre, post = 2**off, 2 ** (w - off - s)
        vr = vr.reshape(B, pre, 2**s, post)
        vi = vi.reshape(B, pre, 2**s, post)
        e = lambda g, v: jnp.einsum("xy,bpyq->bpxq", g, v, precision=prec)
        nr = e(gr, vr) - e(gi_, vi)
        ni = e(gr, vi) + e(gi_, vr)
        return nr.reshape(B, -1), ni.reshape(B, -1)

    def slope(make_chain, label):
        walls = {}
        for n in (1, 4, 8):
            fn = jax.jit(make_chain(n))
            walls[n] = timeit2(fn, sr, si, reps=10)
        marg = (walls[8] - walls[1]) / 7
        print(f"  {label:34s} wall1={walls[1]*1e3:6.2f} "
              f"wall4={walls[4]*1e3:6.2f} wall8={walls[8]*1e3:6.2f} "
              f"-> marginal {marg*1e3:6.3f} ms/apply")

    d_bytes = B * 2**w * 8
    print(f"w={w} B={B} groups={sizes}; "
          f"one in+out HBM pass ~{2*d_bytes/819e9*1e3:.2f} ms")

    for gi, (off, s) in enumerate(zip(offs, sizes)):
        pos = ("top" if off == 0 else
               "bottom" if off + s == w else "middle")
        for prec in ("highest", "default"):
            def make(n, gi=gi, off=off, s=s, prec=prec):
                def chain(vr, vi):
                    gr, gi_ = gparts[gi]
                    for _ in range(n):
                        vr, vi = apply_planar(vr, vi, gr, gi_, off, s, prec)
                    return vr, vi
                return chain
            slope(make, f"group{gi} ({pos}, s={s}) {prec}")

    def make_ring(n):
        def chain(vr, vi):
            for _ in range(n):
                vr, vi = vr * sign, vi * sign
            return vr, vi
        return chain
    slope(make_ring, "cz ring sign multiply")


if __name__ == "__main__":
    main()
