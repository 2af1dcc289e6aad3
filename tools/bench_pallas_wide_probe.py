"""On-chip feasibility probes for a VMEM-resident wide-regime kernel.

Answers, on the real TPU, the questions that decide the design of a fused
(11-20+ wire) sublayer kernel (see DESIGN.md wide section):

  P1. How much VMEM can one kernel actually hold? (the Pallas guide says
      ~16 MB/core generically; v5e is believed larger)
  P2. What does an in-kernel 2D transpose of a (128, 8192) f32 plane cost?
  P3. What does a relayout reshape (8192, 128) -> (128, 8192) cost?
  P4. Is a batched 3D dot_general legal in Mosaic at these shapes?
  P5. Group-matmul cost: (128,128) @ (128,8192) f32 'highest'.

Run: python tools/bench_pallas_wide_probe.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MB = 1024 * 1024


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# ---------------------------------------------------------------- P1: VMEM
def probe_vmem(size_mb: int) -> bool:
    n = size_mb * MB // 4 // 128  # rows of a (n, 128) f32 scratch

    def kernel(x_ref, o_ref, scratch):
        scratch[0:8, :] = x_ref[:]
        o_ref[:] = scratch[0:8, :] + scratch[n - 8:n, :]

    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(size_mb + 8) * MB),
        )
        x = jnp.ones((8, 128), jnp.float32)
        jax.block_until_ready(fn(x))
        return True
    except Exception as e:  # noqa: BLE001
        print(f"    {size_mb} MB failed: {str(e)[:200]}")
        return False


# ------------------------------------------------- P2/P3/P5: op-cost probes
def _loop_kernel(body, n_iters: int):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        x = jax.lax.fori_loop(0, n_iters, body, x)
        o_ref[:] = x
    return kernel


def probe_transpose(n_iters=50):
    shape = (128, 8192)

    def body(i, x):
        # two transposes per iter keeps the carry shape stable
        return jnp.transpose(jnp.transpose(x) * 1.000001)

    fn = pl.pallas_call(
        _loop_kernel(body, n_iters),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * MB),
    )
    x = jnp.ones(shape, jnp.float32)
    t = _time(fn, x)
    return t / (2 * n_iters)


def probe_reshape(n_iters=50):
    shape = (8192, 128)

    def body(i, x):
        y = x.reshape(128, 8192) * 1.000001
        return y.reshape(8192, 128) * 0.999999

    fn = pl.pallas_call(
        _loop_kernel(body, n_iters),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * MB),
    )
    x = jnp.ones(shape, jnp.float32)
    t = _time(fn, x)
    return t / (2 * n_iters)


def probe_matmul2(n_iters=50, m=128, n=8192):
    def kernel(g_ref, x_ref, o_ref):
        g = g_ref[:]

        def body(i, x):
            return jax.lax.dot_general(
                g, x, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        o_ref[:] = jax.lax.fori_loop(0, n_iters, body, x_ref[:])

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * MB),
    )
    g = jnp.eye(m, dtype=jnp.float32) * 0.9999
    x = jnp.ones((m, n), jnp.float32)
    t0 = _time(lambda a, b: fn(a, b), g, x)
    return t0 / n_iters


def probe_dot3d():
    """Batched (A, 128, 64) x (128, 128) contraction on the middle axis."""
    def kernel(g_ref, x_ref, o_ref):
        g = g_ref[:]
        x = x_ref[:]
        o_ref[:] = jax.lax.dot_general(
            g, x, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).transpose(1, 0, 2)

    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        g = jnp.eye(128, dtype=jnp.float32)
        x = jnp.ones((128, 128, 64), jnp.float32)
        jax.block_until_ready(fn(g, x))
        return True
    except Exception as e:  # noqa: BLE001
        print(f"    3D dot failed: {str(e)[:300]}")
        return False


def main():
    print(f"device: {jax.devices()[0]}")
    print("P1: VMEM capacity (scratch alloc)")
    for mb in (16, 32, 64, 96, 112, 120, 127):
        ok = probe_vmem(mb)
        print(f"    {mb:4d} MB: {'ok' if ok else 'FAIL'}")
        if not ok:
            break
    print("P2: in-kernel transpose (128,8192) f32")
    t = probe_transpose()
    print(f"    {t * 1e6:8.1f} us/transpose ({4 * MB / t / 1e9:.0f} GB/s eff)")
    print("P3: in-kernel relayout reshape (8192,128)->(128,8192)")
    t = probe_reshape()
    print(f"    {t * 1e6:8.1f} us/reshape ({4 * MB / t / 1e9:.0f} GB/s eff)")
    print("P5: in-kernel matmul (128,128)@(128,8192) f32 highest")
    t = probe_matmul2()
    gf = 2 * 128 * 128 * 8192 / t / 1e9
    print(f"    {t * 1e6:8.1f} us/matmul ({gf:.0f} GFLOP/s)")
    print("P4: batched 3D dot_general (middle-axis contraction)")
    ok = probe_dot3d()
    print(f"    {'ok' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
