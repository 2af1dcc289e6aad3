"""Micro-benchmark: formulations for grouped gate application at 20 wires.

Decides the contraction shape for the wide-wire grouped chain (sim/wide.py):
applying all per-wire rotations of one SEL sublayer as kron-composed group
matrices (2^m x 2^m) contracted against reshaped state axes, vs the per-gate
apply_1q loop the adjoint path uses today (sim/adjoint.py).

Run on the real chip:  python tools/bench_wide_micro.py [--wires 20]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _sync_reduce(out):
    return jnp.real(out).sum() + jnp.imag(out).sum()


def _sync(out):
    # block_until_ready does not wait for execution on the axon tunnel;
    # force a 4-byte dependent fetch instead (same trick as bench.py).
    # The reduction itself must be jitted: eager complex->real dispatch
    # hits UNIMPLEMENTED on the axon backend.
    return float(_sync_reduce(out))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


def timeit2(fn, *args, reps=20):
    """timeit for functions returning a (re, im) plane tuple."""
    out = fn(*args)
    _sync(out[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out[0])
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wires", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--m", type=int, default=7)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()

    w, B, m = args.wires, args.batch, args.m
    d = 2**w
    prec = args.precision
    # the axon tunnel cannot TRANSFER complex buffers (device_put of a
    # complex numpy array and eager complex ops both hit UNIMPLEMENTED);
    # device-RESIDENT complex across jit boundaries is fine — so ship
    # float32 planes and assemble on device.
    rng = np.random.default_rng(0)

    def put_c(arr_np):
        re = jax.device_put(np.real(arr_np).astype(np.float32))
        im = jax.device_put(np.imag(arr_np).astype(np.float32))
        return jax.jit(lambda a, b: a + 1j * b)(re, im)

    st_np = (rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d)))
    st_np /= np.linalg.norm(st_np, axis=1, keepdims=True)
    st = put_c(st_np)
    M = put_c(rng.standard_normal((2**m, 2**m))
              + 1j * rng.standard_normal((2**m, 2**m)))

    print(f"wires={w} d={d} B={B} m={m} prec={prec} "
          f"state={B * d * 8 / 2**20:.0f} MiB")

    # 1) per-gate apply_1q over all w wires (the current adjoint inner loop)
    from qiddm_tpu.sim.gates import rot_matrix
    from qiddm_tpu.sim.statevector import apply_1q

    angles = jax.device_put(rng.standard_normal((w, 3)).astype(np.float32))
    mats = jax.jit(lambda a: rot_matrix(a[:, 0], a[:, 1], a[:, 2]))(angles)

    @jax.jit
    def pergate(st, mats):
        for j in range(w):
            st = apply_1q(st, mats[j], j, w)
        return st

    t = timeit(pergate, st, mats)
    print(f"per-gate ({w} x apply_1q):      {t * 1e3:8.2f} ms  "
          f"({B * d * 8 * 2 * w / t / 1e9:.0f} GB/s eff)")

    # group shapes: minor (post=1), mid, major (pre=1)
    for name, pre, post in (
        ("minor", d // 2**m, 1),
        ("mid", 2**m, d // 4**m),
        ("major", 1, d // 2**m),
    ):
        @jax.jit
        def eins(st, M, pre=pre, post=post):
            v = st.reshape(B, pre, 2**m, post)
            o = jnp.einsum("xy,bpyq->bpxq", M, v, precision=prec)
            return o.reshape(B, d)

        t = timeit(eins, st, M)
        gb = B * d * 8 * 2 / t / 1e9
        fl = B * d * 2**m * 8 / t / 1e12
        print(f"einsum {name:5} (pre={pre:>6},post={post:>6}): "
              f"{t * 1e3:8.2f} ms  ({gb:5.0f} GB/s, {fl:5.1f} TFLOP/s)")

        # transpose-sandwich variant: group to minor axis, contract, back
        if post > 1:
            @jax.jit
            def sandw(st, M, pre=pre, post=post):
                v = st.reshape(B, pre, 2**m, post)
                v = jnp.swapaxes(v, 2, 3)
                o = jnp.einsum("xy,bpqy->bpqx", M, v, precision=prec)
                return jnp.swapaxes(o, 2, 3).reshape(B, d)

            t = timeit(sandw, st, M)
            gb = B * d * 8 * 2 / t / 1e9
            print(f"sandwich {name:5} swapaxes:            "
                  f"{t * 1e3:8.2f} ms  ({gb:5.0f} GB/s)")

    # full sublayer: 3 groups (sizes summing to w) + CZ diag
    sizes = []
    left = w
    while left > 0:
        sizes.append(min(m, left))
        left -= sizes[-1]
    Ms = [put_c(rng.standard_normal((2**s, 2**s))
                + 1j * rng.standard_normal((2**s, 2**s)))
          for s in sizes]
    sgn = jax.device_put(np.sign(rng.standard_normal(d)).astype(np.float32))

    @jax.jit
    def sublayer(st, Ms, sgn):
        off = 0  # bits consumed from the MSB side
        for Mi, s in zip(Ms, sizes):
            pre = 2**off
            post = d // pre // 2**s
            v = st.reshape(B, pre, 2**s, post)
            st = jnp.einsum("xy,bpyq->bpxq", Mi, v,
                            precision=prec).reshape(B, d)
            off += s
        return st * sgn

    t = timeit(sublayer, st, Ms, sgn)
    print(f"full sublayer ({len(sizes)} groups {sizes} + diag): "
          f"{t * 1e3:8.2f} ms -> est fwd (28 sublayers) {t * 28 * 1e3:.0f} ms")
    print(f"  vs per-gate sublayer: {timeit(pergate, st, mats) * 1e3:.2f} ms")

    # ---- plane-stacked REAL formulation ------------------------------------
    # state as (B, d) f32 planes sr/si; a complex group matmul G @ v becomes
    # ONE real matmul with W = [[Gr, -Gi], [Gi, Gr]] (2^{m+1} x 2^{m+1})
    # against the planes stacked on the contraction axis. Same FLOPs as the
    # 4-real-matmul complex decomposition, but a single fused MXU pass and
    # no complex handling anywhere.
    sr = jax.device_put(np.real(st_np).astype(np.float32))
    si = jax.device_put(np.imag(st_np).astype(np.float32))
    Ws = []
    for s in sizes:
        Gr = rng.standard_normal((2**s, 2**s)).astype(np.float32)
        Gi = rng.standard_normal((2**s, 2**s)).astype(np.float32)
        Ws.append(jax.device_put(
            np.block([[Gr, -Gi], [Gi, Gr]]).astype(np.float32)))

    def make_planes_sublayer(prec_):
        @jax.jit
        def planes_sublayer(sr, si, Ws, sgn):
            off = 0
            for Wi, s in zip(Ws, sizes):
                pre = 2**off
                post = d // pre // 2**s
                vr = sr.reshape(B, pre, 2**s, post)
                vi = si.reshape(B, pre, 2**s, post)
                v2 = jnp.concatenate([vr, vi], axis=2)  # (B, pre, 2^{s+1}, post)
                o2 = jnp.einsum("xy,bpyq->bpxq", Wi, v2, precision=prec_)
                sr = o2[:, :, :2**s].reshape(B, d)
                si = o2[:, :, 2**s:].reshape(B, d)
                off += s
            return sr * sgn, si * sgn
        return planes_sublayer

    for prec_ in (prec, "high", "default"):
        fn = make_planes_sublayer(prec_)
        tp = timeit2(fn, sr, si, Ws, sgn)
        print(f"planes sublayer (stacked real W, prec={prec_:8}): "
              f"{tp * 1e3:8.2f} ms -> est fwd {tp * 28 * 1e3:.0f} ms")

    # group-size sweep on the single minor einsum (complex) to find the
    # bandwidth/compute crossover
    for mm in (4, 5, 6, 7, 8):
        Mi = put_c(rng.standard_normal((2**mm, 2**mm))
                   + 1j * rng.standard_normal((2**mm, 2**mm)))

        @jax.jit
        def eins_m(st, Mi, mm=mm):
            v = st.reshape(B, d // 2**mm, 2**mm)
            return jnp.einsum("xy,bpy->bpx", Mi, v,
                              precision=prec).reshape(B, d)

        tm = timeit(eins_m, st, Mi)
        print(f"minor einsum m={mm}: {tm * 1e3:7.2f} ms "
              f"({B * d * 2**mm * 8 / tm / 1e12:5.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
