"""VMEM-resident fused kernel for the wide (13-20 wire) re-uploading chain.

The grouped-Kronecker XLA chain (sim/wide.py) cut the wide regime's HBM
passes from ``wires`` to ``ceil(w/7)`` per sublayer, but every group
contraction still round-trips the full (B, 2**w) state through HBM — at
w=20 a training step moves ~63 GB and lands at ~26% of the HBM roofline,
with the backward's per-group cotangent reductions measured at their XLA
floor (DESIGN.md wide section; tools/bench_wide_{slope,bwd,dg}_probe.py).

This kernel removes the HBM term: one *superstate* of 2**20 amplitudes
(two 4 MB f32 planes) lives in VMEM (v5e: 128 MB, measured by
tools/bench_pallas_wide_probe.py) for the WHOLE L x k chain. HBM traffic
per superstate collapses to one read of the encoding phases and one
write of the final state; every group matmul, ring sign pass, and — in
the backward — every reconstruct / cotangent-push / dG reduction is
VMEM->MXU work. The dG reduction that cost ~82 ms/step in XLA (a
bandwidth-bound outer-product over HBM) becomes a tall-K MXU matmul
over resident planes.

**Superstate batch packing.** Chains narrower than 20 wires are padded
to 20 bits by prepending ``p = 20 - w`` *batch bits*: 2**p samples pack
into one superstate, their encodings concatenated (a pure reshape of the
(B, 2**w) phase table) and the per-wire gate list extended with identity
gates on the batch bits, so the padded group matrices are
``I_{2**pb} (x) G`` blocks that never mix samples. One kernel shape
serves every width; the MXU matmuls always run at the full
(128, 8192)-plane size; dG/d_enc stay exact because padded tail samples
carry zero cotangents.

**Layout: the transpose cycle.** The superstate is a 2D
(2**s_g, 2**(20-s_g)) f32 plane pair whose leading axis is the group
currently being applied (groups (7, 7, 6) -> axes (128, 128, 64)). A
sublayer applies G0, rotates left (``x.T.reshape``), applies G1, rotates
left, applies G2 + the CZ ring (sign rows pre-permuted to this
(g2, g0, g1) layout), then rotates *right* twice (``x.reshape(-1, d).T``)
back to basis order — the right-rotations keep every Mosaic relayout at
lane dims >= 128, which the naive third left-rotation would violate
(an unsupported (16384, 64) -> (128, 8192) shape cast). Each complex
group apply is 4 real MXU matmuls at the configured precision.

The backward walks the chain in reverse per superstate: states
reconstructed through ``G^H`` (zero residual memory), cotangents pushed
through ``G^T`` (JAX's unconjugated convention, matching sim/wide.py),
and each sublayer-group's ``dG[x, y] = sum_r c_out[x, r] * s_in[y, r]``
accumulated straight into a VMEM-resident (L*k, d, d) output block
across the sequential batch grid.

Scope (routed from sim/wide.py): RZ-encoded re-uploading chains with CZ
rings and |0..0> init — the QIDDM-A/L/LL wide configs. RY encodes, CNOT
rings, arbitrary initial states, and widths outside [13, 20] keep the
XLA grouped chain.

Reference parity anchor: this replaces what PennyLane-Lightning's C++
adjoint statevector does for the reference at width (reference
nn/qdense.py:237,1285-1297) — tests pin values and gradients against
sim/wide.py and plain autodiff (tests/test_wide_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sel import cz_ring_signs, sel_ranges

MB = 1024 * 1024
_F32 = jnp.float32

TOTAL_BITS = 20          # superstate width: 2**20 amplitudes, 4 MB planes
SIZES = (7, 7, 6)        # group partition of the 20 bits -> (128, 128, 64)
MIN_WIRES = 13           # below: the <=12-wire gate kernels / XLA paths


def _dims_rests(sizes=SIZES, total=TOTAL_BITS):
    dims = tuple(2**s for s in sizes)
    rests = tuple(2 ** (total - s) for s in sizes)
    return dims, rests


@functools.lru_cache(maxsize=None)
def ring_sign_rows(k: int, wires: int) -> np.ndarray:
    """CZ ring sign rows for the k sublayer ranges of a ``wires``-wide
    ring, tiled over the superstate's batch bits and pre-permuted to the
    transpose-cycle layout (g2, g0, g1) where the kernel applies the
    ring. (k, dims[-1], rests[-1]) float32."""
    dims, rests = _dims_rests()
    n = len(dims)
    rot = (n - 1,) + tuple(range(n - 1))
    rows = []
    for r in sel_ranges(k, wires):
        base = np.tile(cz_ring_signs(wires, r), 2 ** (TOTAL_BITS - wires))
        row = base.reshape(dims)
        rows.append(np.transpose(row, rot).reshape(dims[-1], rests[-1]))
    return np.stack(rows).astype(np.float32)


def _precision():
    from .. import config as _config
    p = _config.matmul_precision()
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}.get(p, jax.lax.Precision.DEFAULT)


def _cmm(gr, gi, xr, xi, prec):
    """Complex matmul G @ X on f32 planes: 4 real MXU matmuls."""
    dn = (((1,), (0,)), ((), ()))
    f = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          precision=prec, preferred_element_type=_F32)
    return f(gr, xr) - f(gi, xi), f(gr, xi) + f(gi, xr)


def _cdg(cr, ci, sr, si, prec):
    """Unconjugated complex dG = sum_r c[:, r] s[:, r] -> (d, d) planes."""
    dn = (((1,), (1,)), ((), ()))
    f = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          precision=prec, preferred_element_type=_F32)
    return f(cr, sr) - f(ci, si), f(cr, si) + f(ci, sr)


def _rotl(x, next_first: int):
    """Rotate layout left (leading axis to the back); the new leading
    axis has size ``next_first``. Lane dims stay >= 128 at every step of
    the (128, 128, 64) cycle (probed: tools/bench_pallas_wide_probe.py)."""
    return x.T.reshape(next_first, -1)


def _rotr(x, next_first: int):
    """Rotate layout right (trailing axis of size ``next_first`` to the
    front) — the Mosaic-clean way back from the (g2, g0, g1) layout."""
    return x.reshape(-1, next_first).T


def _vmem_params(budget_mb: int = 120):
    return pltpu.CompilerParams(vmem_limit_bytes=budget_mb * MB)


# --------------------------------------------------------------- forward
def _fwd_kernel(L, k, wires, prec, sg_ref, er_ref, ei_ref, *refs):
    dims, rests = _dims_rests()
    n = len(dims)
    g_refs, (or_ref, oi_ref) = refs[:2 * n], refs[2 * n:]
    d0, r0 = dims[0], rests[0]
    er, ei = er_ref[0], ei_ref[0]
    # packed |0..0> init: amplitude 1 wherever n % 2**wires == 0
    row = jax.lax.broadcasted_iota(jnp.int32, (d0, r0), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (d0, r0), 1)
    idx0 = row * r0 + col
    zero_r = ((idx0 & (2**wires - 1)) == 0).astype(_F32)

    def layer(l, carry):
        sr, si = carry
        sr, si = sr * er - si * ei, sr * ei + si * er  # RZ re-upload
        for li in range(k):
            idx = l * k + li
            for gi in range(n):
                gr, gm = g_refs[2 * gi][idx], g_refs[2 * gi + 1][idx]
                sr, si = _cmm(gr, gm, sr, si, prec)
                if gi < n - 1:
                    sr = _rotl(sr, dims[gi + 1])
                    si = _rotl(si, dims[gi + 1])
            sg = sg_ref[li]  # ring lands at the (g2, g0, g1) layout
            sr, si = sr * sg, si * sg
            for gi in range(n - 2, -1, -1):  # rotate right back to rho^0
                sr = _rotr(sr, dims[gi])
                si = _rotr(si, dims[gi])
        return sr, si

    sr, si = jax.lax.fori_loop(
        0, L, layer, (zero_r, jnp.zeros((d0, r0), _F32)))
    or_ref[0], oi_ref[0] = sr, si


def wide_fwd_planes(enc_planes, gs_planes, L: int, k: int, wires: int,
                    interpret: bool = False):
    """Fused forward chain over packed superstates. enc_planes: (er, ei)
    each (B', d0, r0) f32; gs_planes: flat tuple (g0r, g0i, g1r, g1i,
    g2r, g2i) each (L*k, d, d) f32 (padded groups). Returns final-state
    planes (or, oi) each (B', d0, r0)."""
    dims, rests = _dims_rests()
    n = len(dims)
    er, ei = enc_planes
    B, d0, r0 = er.shape
    signs = jnp.asarray(ring_sign_rows(k, wires))
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    block = pl.BlockSpec((1, d0, r0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd_kernel, L, k, wires, _precision())
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[const, block, block] + [const] * (2 * n),
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct((B, d0, r0), _F32),
                   jax.ShapeDtypeStruct((B, d0, r0), _F32)),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(signs, er, ei, *gs_planes)


# -------------------------------------------------------------- backward
def _bwd_kernel(L, k, wires, prec, sg_ref, outr_ref, outi_ref,
                ctr_ref, cti_ref, er_ref, ei_ref, *refs):
    dims, rests = _dims_rests()
    n = len(dims)
    g_refs = refs[:2 * n]
    der_ref, dei_ref = refs[2 * n:2 * n + 2]
    dg_refs = refs[2 * n + 2:]
    d0, r0 = dims[0], rests[0]
    er, ei = er_ref[0], ei_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():  # dG accumulators revisit the same block every grid step
        for ref in dg_refs:
            ref[...] = jnp.zeros_like(ref)

    def layer(lr, carry):
        l = L - 1 - lr
        sr, si, cr, ci, der, dei = carry
        for li in range(k - 1, -1, -1):
            idx = l * k + li
            # invert the two right-rotations: left-rotate to (g2, g0, g1)
            for gi in range(1, n):
                sr = _rotl(sr, dims[gi])
                si = _rotl(si, dims[gi])
                cr = _rotl(cr, dims[gi])
                ci = _rotl(ci, dims[gi])
            sg = sg_ref[li]  # undo ring (CZ signs are self-inverse)
            sr, si, cr, ci = sr * sg, si * sg, cr * sg, ci * sg
            for gi in range(n - 1, -1, -1):
                gr, gm = g_refs[2 * gi][idx], g_refs[2 * gi + 1][idx]
                grT, gmT = gr.T, gm.T
                # reconstruct the group's input state through G^H
                sr, si = _cmm(grT, -gmT, sr, si, prec)
                # dG from c_out x s_in, summed over grid via revisiting
                dgr, dgi = _cdg(cr, ci, sr, si, prec)
                dg_refs[2 * gi][idx] = dg_refs[2 * gi][idx] + dgr
                dg_refs[2 * gi + 1][idx] = dg_refs[2 * gi + 1][idx] + dgi
                # push the cotangent through G^T (JAX convention)
                cr, ci = _cmm(grT, gmT, cr, ci, prec)
                if gi > 0:  # invert fwd's left-rotation into this layout
                    sr = _rotr(sr, dims[gi - 1])
                    si = _rotr(si, dims[gi - 1])
                    cr = _rotr(cr, dims[gi - 1])
                    ci = _rotr(ci, dims[gi - 1])
        # reverse through the RZ encode (unit phases: conj == inverse)
        sr, si = sr * er + si * ei, si * er - sr * ei
        der = der + (cr * sr - ci * si)
        dei = dei + (cr * si + ci * sr)
        cr, ci = cr * er - ci * ei, cr * ei + ci * er
        return sr, si, cr, ci, der, dei

    z = jnp.zeros((d0, r0), _F32)
    _, _, _, _, der, dei = jax.lax.fori_loop(
        0, L, layer,
        (outr_ref[0], outi_ref[0], ctr_ref[0], cti_ref[0], z, z))
    der_ref[0], dei_ref[0] = der, dei


def wide_bwd_planes(out_planes, ct_planes, enc_planes, gs_planes, L: int,
                    k: int, wires: int, interpret: bool = False):
    """Fused adjoint backward. Returns (denc_planes, dgs_planes) matching
    sim/wide.py's cotangent conventions (unconjugated). Packed tail
    samples carry zero cotangents, so their dG/d_enc terms vanish."""
    dims, rests = _dims_rests()
    n = len(dims)
    er, ei = enc_planes
    B, d0, r0 = er.shape
    signs = jnp.asarray(ring_sign_rows(k, wires))
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    block = pl.BlockSpec((1, d0, r0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    acc = pl.BlockSpec(memory_space=pltpu.VMEM)  # revisited accumulator
    plane = jax.ShapeDtypeStruct((B, d0, r0), _F32)
    dg_shapes, dg_specs = [], []
    for d in dims:
        dg_shapes += [jax.ShapeDtypeStruct((L * k, d, d), _F32)] * 2
        dg_specs += [acc, acc]
    kern = functools.partial(_bwd_kernel, L, k, wires, _precision())
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[const, block, block, block, block, block, block]
        + [const] * (2 * n),
        out_specs=tuple([block, block] + dg_specs),
        out_shape=tuple([plane, plane] + dg_shapes),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(signs, *out_planes, *ct_planes, *enc_planes, *gs_planes)
    return (out[0], out[1]), tuple(out[2:])


# ------------------------------------------- per-sublayer scan variant
#
# The monolithic chain kernels above hold the superstate in VMEM for the
# WHOLE L x k chain — minimum HBM traffic, but Mosaic compile cost was
# measured to scale with chain depth (tools/bench_wide_kernel_bisect.py:
# 556 s for the L=1 forward through the axon remote compiler; even the
# L=1 backward OOM-kills the compile helper — results/
# wide_kernel_bisect.json). This variant trades 2 HBM passes per *sublayer* (16 MB at
# w=20, ~0.6 ms/step of extra traffic — negligible against the step's
# ~2.9 TFLOP of matmul work) for a bounded compile: ONE tiny sublayer
# program each for fwd and bwd, reused across the chain by lax.scan.
# Everything inside a sublayer (3 group matmuls, ring signs, the
# backward's reconstruct / cotangent-push / dG) is still VMEM->MXU work;
# the RZ re-upload between layers is 3 elementwise HBM passes in XLA.


def _sub_fwd_kernel(prec, sg_ref, sr_ref, si_ref, *refs):
    dims, _ = _dims_rests()
    n = len(dims)
    g_refs, (or_ref, oi_ref) = refs[:2 * n], refs[2 * n:]
    sr, si = sr_ref[0], si_ref[0]
    for gi in range(n):
        sr, si = _cmm(g_refs[2 * gi][...], g_refs[2 * gi + 1][...],
                      sr, si, prec)
        if gi < n - 1:
            sr = _rotl(sr, dims[gi + 1])
            si = _rotl(si, dims[gi + 1])
    sg = sg_ref[...]
    sr, si = sr * sg, si * sg
    for gi in range(n - 2, -1, -1):
        sr = _rotr(sr, dims[gi])
        si = _rotr(si, dims[gi])
    or_ref[0], oi_ref[0] = sr, si


def _sub_bwd_kernel(prec, sg_ref, sr_ref, si_ref, cr_ref, ci_ref, *refs):
    dims, _ = _dims_rests()
    n = len(dims)
    g_refs = refs[:2 * n]
    or_ref, oi_ref, qr_ref, qi_ref = refs[2 * n:2 * n + 4]
    dg_refs = refs[2 * n + 4:]

    @pl.when(pl.program_id(0) == 0)
    def _init():  # dG accumulators revisit the same block every grid step
        for ref in dg_refs:
            ref[...] = jnp.zeros_like(ref)

    sr, si = sr_ref[0], si_ref[0]
    cr, ci = cr_ref[0], ci_ref[0]
    for gi in range(1, n):  # invert fwd's two right-rotations
        sr, si = _rotl(sr, dims[gi]), _rotl(si, dims[gi])
        cr, ci = _rotl(cr, dims[gi]), _rotl(ci, dims[gi])
    sg = sg_ref[...]  # undo ring (CZ signs are self-inverse)
    sr, si, cr, ci = sr * sg, si * sg, cr * sg, ci * sg
    for gi in range(n - 1, -1, -1):
        gr, gm = g_refs[2 * gi][...], g_refs[2 * gi + 1][...]
        grT, gmT = gr.T, gm.T
        # reconstruct the group's input state through G^H
        sr, si = _cmm(grT, -gmT, sr, si, prec)
        # dG from c_out x s_in, summed over the batch grid via revisiting
        dgr, dgi = _cdg(cr, ci, sr, si, prec)
        dg_refs[2 * gi][...] = dg_refs[2 * gi][...] + dgr
        dg_refs[2 * gi + 1][...] = dg_refs[2 * gi + 1][...] + dgi
        # push the cotangent through G^T (JAX convention)
        cr, ci = _cmm(grT, gmT, cr, ci, prec)
        if gi > 0:  # invert fwd's left-rotation into this layout
            sr, si = _rotr(sr, dims[gi - 1]), _rotr(si, dims[gi - 1])
            cr, ci = _rotr(cr, dims[gi - 1]), _rotr(ci, dims[gi - 1])
    or_ref[0], oi_ref[0] = sr, si
    qr_ref[0], qi_ref[0] = cr, ci


def _packed_zero_planes(B: int, wires: int):
    """Packed |0..0> superstate planes: amplitude 1 wherever the basis
    index is 0 mod 2**wires (one 1 per packed sample)."""
    dims, rests = _dims_rests()
    d0, r0 = dims[0], rests[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (d0, r0), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (d0, r0), 1)
    idx0 = row * r0 + col
    zr = jnp.broadcast_to(((idx0 & (2**wires - 1)) == 0).astype(_F32),
                          (B, d0, r0))
    return zr, jnp.zeros((B, d0, r0), _F32)


def _sub_fwd_call(wires: int, B: int, interpret: bool):
    dims, rests = _dims_rests()
    n = len(dims)
    d0, r0 = dims[0], rests[0]
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    block = pl.BlockSpec((1, d0, r0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((B, d0, r0), _F32)
    kern = functools.partial(_sub_fwd_kernel, _precision())
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[const, block, block] + [const] * (2 * n),
        out_specs=(block, block),
        out_shape=(plane, plane),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )


def _sub_bwd_call(wires: int, B: int, interpret: bool):
    dims, rests = _dims_rests()
    n = len(dims)
    d0, r0 = dims[0], rests[0]
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    block = pl.BlockSpec((1, d0, r0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    acc = pl.BlockSpec(memory_space=pltpu.VMEM)  # revisited accumulator
    plane = jax.ShapeDtypeStruct((B, d0, r0), _F32)
    dg_shapes, dg_specs = [], []
    for d in dims:
        dg_shapes += [jax.ShapeDtypeStruct((d, d), _F32)] * 2
        dg_specs += [acc, acc]
    kern = functools.partial(_sub_bwd_kernel, _precision())
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[const, block, block, block, block] + [const] * (2 * n),
        out_specs=tuple([block] * 4 + dg_specs),
        out_shape=tuple([plane] * 4 + dg_shapes),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )


def wide_fwd_scan(enc_planes, gs_planes, L: int, k: int, wires: int,
                  interpret: bool = False):
    """Scan twin of wide_fwd_planes: same signature, same result, one
    sublayer-sized Mosaic program reused L*k times."""
    er, ei = enc_planes
    B = er.shape[0]
    signs = jnp.asarray(ring_sign_rows(k, wires))
    call = _sub_fwd_call(wires, B, interpret)
    n = len(SIZES)
    # per-layer xs: each group's (L, k, d, d) plane stack
    xs = tuple(g.reshape(L, k, *g.shape[1:]) for g in gs_planes)

    def layer(carry, g_l):
        sr, si = carry
        sr, si = sr * er - si * ei, sr * ei + si * er  # RZ re-upload
        for li in range(k):
            out = call(signs[li], sr, si,
                       *(g_l[j][li] for j in range(2 * n)))
            sr, si = out
        return (sr, si), None

    (sr, si), _ = jax.lax.scan(layer, _packed_zero_planes(B, wires), xs)
    return sr, si


def wide_bwd_scan(out_planes, ct_planes, enc_planes, gs_planes, L: int,
                  k: int, wires: int, interpret: bool = False):
    """Scan twin of wide_bwd_planes: same cotangent conventions, one
    sublayer-sized backward program reused L*k times (reversed)."""
    er, ei = enc_planes
    B = er.shape[0]
    signs = jnp.asarray(ring_sign_rows(k, wires))
    call = _sub_bwd_call(wires, B, interpret)
    n = len(SIZES)
    xs = tuple(g.reshape(L, k, *g.shape[1:])[::-1] for g in gs_planes)

    def layer(carry, g_l):
        sr, si, cr, ci, der, dei = carry
        dgs_l = []
        for li in range(k - 1, -1, -1):
            out = call(signs[li], sr, si, cr, ci,
                       *(g_l[j][li] for j in range(2 * n)))
            sr, si, cr, ci = out[:4]
            dgs_l.append(out[4:])
        # reverse through the RZ encode (unit phases: conj == inverse)
        sr, si = sr * er + si * ei, si * er - sr * ei
        der = der + (cr * sr - ci * si)
        dei = dei + (cr * si + ci * sr)
        cr, ci = cr * er - ci * ei, cr * ei + ci * er
        # restore sublayer order li = 0..k-1 for stacking
        ys = tuple(jnp.stack([dgs_l[k - 1 - li][j] for li in range(k)])
                   for j in range(2 * n))
        return (sr, si, cr, ci, der, dei), ys

    dims, rests = _dims_rests()
    d0, r0 = dims[0], rests[0]
    z = jnp.zeros((B, d0, r0), _F32)
    carry0 = (*out_planes, *ct_planes, z, z)
    (sr, si, cr, ci, der, dei), dgs = jax.lax.scan(layer, carry0, xs)
    # dgs[j]: (L, k, d, d) stacked in reversed-layer order -> restore
    dg_planes = tuple(d[::-1].reshape(L * k, *d.shape[2:]) for d in dgs)
    return (der, dei), dg_planes


# ----------------------------------------------------- complex adapters
def to_planes(x):
    """(B', 2**20) complex -> ((B', d0, r0) f32 re, im). Plain ops — only
    called inside sim/wide.py's custom-VJP fwd/bwd, never differentiated."""
    dims, rests = _dims_rests()
    v = x.reshape(x.shape[0], dims[0], rests[0])
    return (jnp.real(v).astype(_F32), jnp.imag(v).astype(_F32))


def from_planes(planes, dtype=jnp.complex64):
    pr, pi = planes
    b = pr.shape[0]
    return (pr + 1j * pi).astype(dtype).reshape(b, -1)


def gs_to_planes(gs):
    """Tuple over groups of (L, k, d, d) complex -> flat f32 plane tuple
    ((L*k, d, d) re, im, ...)."""
    out = []
    for g in gs:
        flat = g.reshape(-1, g.shape[-2], g.shape[-1])
        out += [jnp.real(flat).astype(_F32), jnp.imag(flat).astype(_F32)]
    return tuple(out)


def dgs_from_planes(dg_planes, L: int, k: int, dtype=jnp.complex64):
    dims, _ = _dims_rests()
    out = []
    for gi, d in enumerate(dims):
        re, im = dg_planes[2 * gi], dg_planes[2 * gi + 1]
        out.append((re + 1j * im).astype(dtype).reshape(L, k, d, d))
    return tuple(out)
