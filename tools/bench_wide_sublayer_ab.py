"""Why is the w=20 grouped sublayer 3x off its HBM model? (3.9 ms
measured vs ~1.3 ms for 4 full-state passes at 819 GB/s.)

Times formulation variants of ONE sublayer forward (3 group contractions
+ CZ ring) at the suite shape (w=20, B=8) and dumps the optimized HLO op
mix of the current formulation so transposes/copies XLA sneaks in are
visible.

Variants:
  v0_complex_einsum   current sim/wide.py: c64 einsum per group
  v1_real_planar      (sr, si) f32 planes, 4 real einsums per group
  v2_real_stackB      f32 planes with re/im STACKED on the batch axis
                      (one einsum per group, 2B batch; G real/imag cross
                      terms recombined after)
Run: python tools/bench_wide_sublayer_ab.py [--wires 20]
"""

from __future__ import annotations

import argparse
import collections
import pathlib
import re
import sys
import time

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

    from qiddm_tpu.sim.adjoint import _ring_tables
    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.wide import (_apply_group, _offsets, group_gates,
                                    group_sizes)

    sizes = group_sizes(w)
    offs = _offsets(sizes)

    @jax.jit
    def setup():
        # everything under jit: eager complex ops are UNIMPLEMENTED on
        # the axon backend (errors surface at the next host fetch)
        r = jax.random.normal(jax.random.PRNGKey(0), (B, 2**w))
        i = jax.random.normal(jax.random.PRNGKey(9), (B, 2**w))
        st = jax.lax.complex(r, i)
        st = st / jnp.linalg.norm(st, axis=1, keepdims=True)
        mats = rot_matrix(*(jax.random.normal(jax.random.PRNGKey(t), (w,))
                            for t in range(3)))  # (w, 2, 2) c64
        return st, group_gates(mats.astype(jnp.complex64), sizes)

    st, gs = setup()
    _, tab_np, _ = _ring_tables(1, 1, w, "cz", False)
    sign = np.asarray(tab_np)[0, 0]  # (2**w,) CZ ring signs, host constant

    # --- v0: current complex einsum ---------------------------------------
    @jax.jit
    def v0(st, gs):
        for g, off, s in zip(gs, offs, sizes):
            st = _apply_group(st, g, off, s, w)
        return st * sign

    # --- v1: planar real, 4 einsums per group -----------------------------
    def apply_group_planar(sr, si, gr, gi, off, s):
        pre, post = 2**off, 2 ** (w - off - s)
        vr = sr.reshape(B, pre, 2**s, post)
        vi = si.reshape(B, pre, 2**s, post)
        e = lambda g, v: jnp.einsum("xy,bpyq->bpxq", g, v,
                                    precision="highest")
        nr = e(gr, vr) - e(gi, vi)
        ni = e(gr, vi) + e(gi, vr)
        return nr.reshape(B, -1), ni.reshape(B, -1)

    @jax.jit
    def v1(sr, si, gparts):
        for (gr, gi), off, s in zip(gparts, offs, sizes):
            sr, si = apply_group_planar(sr, si, gr, gi, off, s)
        return sr * sign, si * sign

    # --- v2: re/im stacked on the batch axis, 2 einsums per group ---------
    def apply_group_stacked(p, gr, gi, off, s):
        # p: (2B, d) rows [sr; si]
        pre, post = 2**off, 2 ** (w - off - s)
        v = p.reshape(2 * B, pre, 2**s, post)
        a = jnp.einsum("xy,bpyq->bpxq", gr, v,
                       precision="highest").reshape(2 * B, -1)
        b = jnp.einsum("xy,bpyq->bpxq", gi, v,
                       precision="highest").reshape(2 * B, -1)
        br, bi = b[:B], b[B:]
        # new_r = gr@sr - gi@si ; new_i = gr@si + gi@sr
        return jnp.concatenate([a[:B] - bi, a[B:] + br], axis=0)

    @jax.jit
    def v2(p, gparts):
        for (gr, gi), off, s in zip(gparts, offs, sizes):
            p = apply_group_stacked(p, gr, gi, off, s)
        return p * sign

    @jax.jit
    def split(st, gs):
        gp = tuple((jnp.real(g), jnp.imag(g)) for g in gs)
        return gp, jnp.real(st), jnp.imag(st), jnp.concatenate(
            [jnp.real(st), jnp.imag(st)], axis=0)

    gparts, sr, si, p0 = split(st, gs)

    t0 = timeit(v0, st, gs)
    t1 = timeit2(v1, sr, si, gparts)
    t2 = timeit(v2, p0, gparts)

    # parity (fetch planes, not complex arrays — complex host fetches are
    # unimplemented on the axon tunnel)
    reim = jax.jit(lambda z: (jnp.real(z), jnp.imag(z)))
    z0r, z0i = reim(v0(st, gs))
    out0 = np.asarray(z0r) + 1j * np.asarray(z0i)
    o1r, o1i = v1(sr, si, gparts)
    out1 = np.asarray(o1r) + 1j * np.asarray(o1i)
    o2 = np.asarray(v2(p0, gparts))
    out2 = o2[:B] + 1j * o2[B:]
    print(f"v1 max|delta| {np.abs(out0 - out1).max():.2e}   "
          f"v2 max|delta| {np.abs(out0 - out2).max():.2e}")

    d_bytes = B * 2**w * 8
    model_ms = 4 * 2 * d_bytes / 819e9 * 1e3  # 4 passes in+out
    print(f"sublayer fwd at w={w}, B={B}  (HBM model ~{model_ms:.2f} ms):")
    print(f"  v0 complex einsum : {t0*1e3:8.2f} ms")
    print(f"  v1 real planar    : {t1*1e3:8.2f} ms")
    print(f"  v2 real stacked   : {t2*1e3:8.2f} ms")

    # --- HLO op mix of v0 and the best variant ----------------------------
    for name, fn, a in (("v0", v0, (st, gs)), ("v2", v2, (p0, gparts))):
        hlo = jax.jit(fn).lower(*a).compile().as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(
                r"^\s*(?:ROOT )?%?[\w.-]+ = \S+ ([a-z-]+)\(", hlo,
                re.MULTILINE))
        top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(12))
        n_tr = ops.get("transpose", 0) + ops.get("copy", 0)
        print(f"  {name} HLO: {top}")
        print(f"  {name} transpose+copy ops: {n_tr}")


if __name__ == "__main__":
    main()
