"""Pallas TPU kernels for the hot simulator path.

The re-uploading circuit (the QIDDM families' denoiser core) is a chain of
``L x k`` small complex matmuls interleaved with diagonal phase encodings.
XLA executes each as a separate HBM-roundtrip op; at d = 2**wires <= 256 the
whole chain fits comfortably on-chip, so this kernel runs the ENTIRE chain
with the state batch resident in VMEM, streaming one layer unitary per grid
step (TPU grid steps are sequential, so scratch persists and pallas
double-buffers the layer fetches automatically).

Complex arithmetic is carried as separate real/imag planes (Mosaic has no
complex dtype). The backward pass is a second kernel that walks the chain in
reverse, reconstructing intermediate states via the UNITARY INVERSE
(s = s' @ conj(U)) instead of stashing residuals — zero extra memory, exact
gradients.

Kept as a validated alternative implementation: the gate-level kernel
(pallas_gate_kernel.py) measured faster at every dim and is what
``engine.reupload_block`` uses; this unitary-streaming kernel remains for
CNOT-ring chains and as a cross-check (CPU/interpret test target).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_DIM = 256  # 2 planes x (2-buffered layer + state + phases) in VMEM


def _fwd_kernel(k: int, pr_ref, pi_ref, ur_ref, ui_ref, or_ref, oi_ref,
                sr, si):
    """Grid over layers; scratch (sr, si) carries the state batch."""
    l = pl.program_id(0)
    n_l = pl.num_programs(0)

    @pl.when(l == 0)
    def _():
        # iota mask, not .at[].set — scatter has no Mosaic lowering
        col = jax.lax.broadcasted_iota(jnp.int32, sr.shape, 1)
        sr[:] = jnp.where(col == 0, 1.0, 0.0).astype(jnp.float32)
        si[:] = jnp.zeros(si.shape, jnp.float32)

    # phase encode at block starts (every k-th layer)
    @pl.when(l % k == 0)
    def _():
        tr = sr[:] * pr_ref[:] - si[:] * pi_ref[:]
        ti = sr[:] * pi_ref[:] + si[:] * pr_ref[:]
        sr[:] = tr
        si[:] = ti

    # s' = s @ U.T  (out[b, j] = sum_i U[j, i] s[b, i])
    mr = ur_ref[0].T
    mi = ui_ref[0].T
    a, b = sr[:], si[:]
    sr[:] = jnp.dot(a, mr, preferred_element_type=jnp.float32) - \
        jnp.dot(b, mi, preferred_element_type=jnp.float32)
    si[:] = jnp.dot(a, mi, preferred_element_type=jnp.float32) + \
        jnp.dot(b, mr, preferred_element_type=jnp.float32)

    @pl.when(l == n_l - 1)
    def _():
        or_ref[:] = sr[:]
        oi_ref[:] = si[:]


def _bwd_kernel(k: int, n_layers: int, pr_ref, pi_ref, ur_ref, ui_ref,
                fr_ref, fi_ref, gr_ref, gi_ref,
                dur_ref, dui_ref, dpr_ref, dpi_ref,
                sr, si, cr, ci):
    """Reverse walk. Grid step g processes layer l = n_layers-1-g.

    Scratch: (sr, si) = state AFTER layer l (reconstructed);
             (cr, ci) = cotangent wrt state AFTER layer l.
    ur_ref/ui_ref blocks are indexed reversed via the BlockSpec index_map.
    """
    g = pl.program_id(0)
    l = n_layers - 1 - g

    @pl.when(g == 0)
    def _():
        sr[:] = fr_ref[:]
        si[:] = fi_ref[:]
        cr[:] = gr_ref[:]
        ci[:] = gi_ref[:]
        dpr_ref[:] = jnp.zeros_like(dpr_ref)
        dpi_ref[:] = jnp.zeros_like(dpi_ref)

    mr = ur_ref[0]   # U_r (d, d)
    mi = ui_ref[0]

    # reconstruct t = state BEFORE this layer's matmul: t = s' @ conj(U)
    tr = jnp.dot(sr[:], mr, preferred_element_type=jnp.float32) + \
        jnp.dot(si[:], mi, preferred_element_type=jnp.float32)
    ti = jnp.dot(si[:], mr, preferred_element_type=jnp.float32) - \
        jnp.dot(sr[:], mi, preferred_element_type=jnp.float32)

    # dM for M = U.T: dM_r = t_r^T g_r + t_i^T g_i ; dU = dM.T
    # -> dU_r[j, i] = sum_b (g_r[b, j] t_r[b, i] + g_i[b, j] t_i[b, i])
    gr_, gi_ = cr[:], ci[:]
    dur_ref[0] = jnp.dot(gr_.T, tr, preferred_element_type=jnp.float32) + \
        jnp.dot(gi_.T, ti, preferred_element_type=jnp.float32)
    dui_ref[0] = jnp.dot(gi_.T, tr, preferred_element_type=jnp.float32) - \
        jnp.dot(gr_.T, ti, preferred_element_type=jnp.float32)

    # cotangent through the matmul: gt = g @ conj(M.T) -> planes:
    # gt_r = g_r @ M_r.T + g_i @ M_i.T ; gt_i = g_i @ M_r.T - g_r @ M_i.T
    # with M = U.T: M_r.T = U_r, M_i.T = U_i
    ntr = jnp.dot(gr_, mr, preferred_element_type=jnp.float32) + \
        jnp.dot(gi_, mi, preferred_element_type=jnp.float32)
    nti = jnp.dot(gi_, mr, preferred_element_type=jnp.float32) - \
        jnp.dot(gr_, mi, preferred_element_type=jnp.float32)

    is_block_start = (l % k) == 0

    @pl.when(is_block_start)
    def _():
        # state before the phase: s = t * conj(phase)
        pr_, pi_ = pr_ref[:], pi_ref[:]
        sr[:] = tr * pr_ + ti * pi_
        si[:] = ti * pr_ - tr * pi_
        # phase cotangent: t = s * p (complex elementwise)
        dpr_ref[:] += ntr * sr[:] + nti * si[:]
        dpi_ref[:] += nti * sr[:] - ntr * si[:]
        # cotangent through the phase: gs = gt * conj(p)
        cr[:] = ntr * pr_ + nti * pi_
        ci[:] = nti * pr_ - ntr * pi_

    @pl.when(jnp.logical_not(is_block_start))
    def _():
        sr[:] = tr
        si[:] = ti
        cr[:] = ntr
        ci[:] = nti


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_reupload_chain(pr, pi, ur, ui, k: int, interpret: bool = False):
    """Run the full re-uploading chain fused in one kernel.

    pr, pi: (B, d) real/imag planes of the per-sample RZ phase diagonal,
    applied before every k-th layer. ur, ui: (n_layers, d, d) planes of the
    entangled layer unitaries. Returns (out_r, out_i) state planes.
    """
    return _fused_fwd_call(pr, pi, ur, ui, k, interpret)


def _fused_fwd_call(pr, pi, ur, ui, k, interpret):
    n_layers, d, _ = ur.shape
    B = pr.shape[0]
    kern = functools.partial(_fwd_kernel, k)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(n_layers,),
        in_specs=[
            pl.BlockSpec((B, d), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, d), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), lambda l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32),
            pltpu.VMEM((B, d), jnp.float32),
        ],
        interpret=interpret,
    )(pr, pi, ur, ui)
    return out_r, out_i


def _fused_fwd(pr, pi, ur, ui, k, interpret):
    out = _fused_fwd_call(pr, pi, ur, ui, k, interpret)
    return out, (pr, pi, ur, ui, out[0], out[1])


def _fused_bwd(k, interpret, res, g):
    pr, pi, ur, ui, fr, fi = res
    gr, gi = g
    n_layers, d, _ = ur.shape
    B = pr.shape[0]
    kern = functools.partial(_bwd_kernel, k, n_layers)
    rev = lambda l: (n_layers - 1 - l, 0, 0)  # noqa: E731
    full = lambda l: (0, 0)  # noqa: E731
    dur, dui, dpr, dpi = pl.pallas_call(
        kern,
        grid=(n_layers,),
        in_specs=[
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, d), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_layers, d, d), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, d, d), jnp.float32),
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32),
            pltpu.VMEM((B, d), jnp.float32),
            pltpu.VMEM((B, d), jnp.float32),
            pltpu.VMEM((B, d), jnp.float32),
        ],
        interpret=interpret,
    )(pr, pi, ur, ui, fr, fi, gr, gi)
    return dpr, dpi, dur, dui


fused_reupload_chain.defvjp(_fused_fwd, _fused_bwd)


def reupload_chain_pallas(phases, lus, k: int, interpret: bool = False):
    """Complex-typed wrapper: phases (B, d) complex, lus (L, k, d, d)
    complex -> final states (B, d) complex."""
    L = lus.shape[0]
    flat = lus.reshape(L * k, *lus.shape[2:])
    out_r, out_i = fused_reupload_chain(
        jnp.real(phases).astype(jnp.float32),
        jnp.imag(phases).astype(jnp.float32),
        jnp.real(flat).astype(jnp.float32),
        jnp.imag(flat).astype(jnp.float32),
        k, interpret)
    return out_r + 1j * out_i
