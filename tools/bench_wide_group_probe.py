"""Per-group formulation probe for the wide chain's contractions.

For each group position (top / middle / bottom) at w=20, B=8, times:
  f0 complex einsum (sim/wide.py current)
  f1 real planar 4-einsum
  f2 real planar 4-einsum at precision='default' (bf16 passes — WRONG
     numerics for training, measured only to separate MXU-pass cost
     from layout/copy cost)
  f3 real planar via 2D jnp.dot where the group is top (g @ S2d) or
     bottom (S2d @ g.T) — the canonical MXU forms, no batch dims

Run: python tools/bench_wide_group_probe.py [--wires 20]
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

from tools.bench_wide_micro import timeit, timeit2  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wires", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    w, B = args.wires, args.batch

    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.wide import _offsets, group_gates, group_sizes

    sizes = group_sizes(w)
    offs = _offsets(sizes)

    @jax.jit
    def setup():
        r = jax.random.normal(jax.random.PRNGKey(0), (B, 2**w))
        i = jax.random.normal(jax.random.PRNGKey(9), (B, 2**w))
        st = jax.lax.complex(r, i)
        st = st / jnp.linalg.norm(st, axis=1, keepdims=True)
        mats = rot_matrix(*(jax.random.normal(jax.random.PRNGKey(t), (w,))
                            for t in range(3)))
        gs = group_gates(mats.astype(jnp.complex64), sizes)
        gp = tuple((jnp.real(g), jnp.imag(g)) for g in gs)
        return st, gs, gp, jnp.real(st), jnp.imag(st)

    st, gs, gparts, sr, si = setup()
    d_bytes = B * 2**w * 8
    model_ms = 2 * d_bytes / 819e9 * 1e3
    print(f"w={w} B={B} groups={sizes}; one-pass HBM model ~{model_ms:.2f} ms")

    for gi, (off, s) in enumerate(zip(offs, sizes)):
        pre, post = 2**off, 2 ** (w - off - s)
        pos = ("top" if off == 0 else
               "bottom" if off + s == w else "middle")

        @jax.jit
        def f0(stv, g, off=off, s=s):
            v = stv.reshape(B, pre, 2**s, post)
            out = jnp.einsum("xy,bpyq->bpxq", g, v, precision="highest")
            return out.reshape(B, -1)

        def planar(vr, vi, gr, gi_, prec, off=off, s=s):
            vr = vr.reshape(B, pre, 2**s, post)
            vi = vi.reshape(B, pre, 2**s, post)
            e = lambda g, v: jnp.einsum("xy,bpyq->bpxq", g, v,
                                        precision=prec)
            nr = e(gr, vr) - e(gi_, vi)
            ni = e(gr, vi) + e(gi_, vr)
            return nr.reshape(B, -1), ni.reshape(B, -1)

        f1 = jax.jit(functools.partial(planar, prec="highest"))
        f2 = jax.jit(functools.partial(planar, prec="default"))

        t0 = timeit(f0, st, gs[gi])
        t1 = timeit2(f1, sr, si, *gparts[gi])
        t2 = timeit2(f2, sr, si, *gparts[gi])
        line = (f"  group{gi} ({pos}, s={s}): "
                f"f0={t0*1e3:6.2f}  f1={t1*1e3:6.2f}  f2={t2*1e3:6.2f}")

        if pos in ("top", "bottom"):
            @jax.jit
            def f3(vr, vi, gr, gi_, pos=pos, s=s):
                e = {}
                if pos == "top":
                    vr2, vi2 = (v.reshape(2**s, -1) for v in
                                (vr.T, vi.T))  # (2**s, post*B) basis-major
                    mm = lambda g, v: jnp.dot(g, v, precision="highest")
                else:
                    vr2, vi2 = (v.reshape(-1, 2**s) for v in (vr, vi))
                    mm = lambda g, v: jnp.dot(v, g.T, precision="highest")
                nr = mm(gr, vr2) - mm(gi_, vi2)
                ni = mm(gr, vi2) + mm(gi_, vr2)
                return nr, ni

            t3 = timeit2(f3, sr, si, *gparts[gi])
            line += f"  f3-2d={t3*1e3:6.2f}"
        print(line + "  (ms)")


if __name__ == "__main__":
    main()
