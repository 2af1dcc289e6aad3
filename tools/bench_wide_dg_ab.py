"""dG formulation A/B for the wide chain's backward.

The group cotangent dG[x,y] = sum_{b,p,q} c[b,p,x,q] s[b,p,y,q] measured
0.38 / 1.34 / 1.21 ms marginal for the top/middle/bottom groups at w=20
(bench_wide_bwd_probe.py) — 82 ms of the 231 ms backward. Variants:

  d0 current einsum 'bpxq,bpyq->xy'
  d1 explicit transpose to K-major + 2D matmul:
     c2 = c.transpose -> (b*p*q, x); dG = c2.T @ s2 (MXU form)
  d2 dot_general contracting (b,p,q) with x,y as free dims (same math,
     lets XLA pick; differs from einsum only in op construction)
  d3 fold q into x's minor side via swapaxes(x,q) then contract leading
     dims only ('Kx,Ky->xy' with K=(b,p,q))

Run: python tools/bench_wide_dg_ab.py [--wires 20]
"""

from __future__ import annotations

import argparse
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

    from qiddm_tpu.sim.wide import _offsets, group_sizes

    sizes = group_sizes(w)
    offs = _offsets(sizes)

    @jax.jit
    def setup():
        c = jax.random.normal(jax.random.PRNGKey(0), (B, 2**w))
        s = jax.random.normal(jax.random.PRNGKey(9), (B, 2**w))
        return c, s

    cr, vr = setup()

    def variants(off, s):
        pre, post = 2**off, 2 ** (w - off - s)
        ds = 2**s

        def d0(c, v):
            c4 = c.reshape(B, pre, ds, post)
            v4 = v.reshape(B, pre, ds, post)
            return jnp.einsum("bpxq,bpyq->xy", c4, v4, precision="highest")

        def d1(c, v):
            c4 = c.reshape(B, pre, ds, post).transpose(0, 1, 3, 2)
            v4 = v.reshape(B, pre, ds, post).transpose(0, 1, 3, 2)
            c2 = c4.reshape(-1, ds)
            v2 = v4.reshape(-1, ds)
            return jnp.matmul(c2.T, v2, precision="highest")

        def d2(c, v):
            c4 = c.reshape(B, pre, ds, post)
            v4 = v.reshape(B, pre, ds, post)
            return jax.lax.dot_general(
                c4, v4, dimension_numbers=(((0, 1, 3), (0, 1, 3)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)

        def d3(c, v):
            c4 = jnp.swapaxes(c.reshape(B, pre, ds, post), 2, 3)
            v4 = jnp.swapaxes(v.reshape(B, pre, ds, post), 2, 3)
            return jnp.einsum("Kx,Ky->xy", c4.reshape(-1, ds),
                              v4.reshape(-1, ds), precision="highest")

        return {"d0": d0, "d1": d1, "d2": d2, "d3": d3}

    for gi, (off, s) in enumerate(zip(offs, sizes)):
        pos = ("top" if off == 0 else
               "bottom" if off + s == w else "middle")
        vs = variants(off, s)
        ref = None
        line = f"  group{gi} ({pos}, s={s}):"
        for name, fn in vs.items():
            def make(n, fn=fn):
                def chain(c, v):
                    acc = 0.0
                    for t in range(n):
                        acc = acc + fn(c * (1.0 + 0.01 * t), v)
                    return acc, acc
                return chain
            w1 = timeit2(jax.jit(make(1)), cr, vr, reps=10)
            w8 = timeit2(jax.jit(make(8)), cr, vr, reps=10)
            marg = (w8 - w1) / 7
            out = np.asarray(jax.jit(fn)(cr, vr))
            if ref is None:
                ref = out
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-30)
            line += f"  {name}={marg*1e3:6.3f}ms(err {err:.0e})"
        print(line)


if __name__ == "__main__":
    main()
