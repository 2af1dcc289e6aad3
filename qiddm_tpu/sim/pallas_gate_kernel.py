"""Gate-level fused Pallas kernel for the re-uploading chain at LARGE dims.

The unitary-based kernel (pallas_kernels.py) streams (d, d) layer matrices —
at d = 1024 building those unitaries dominates the step. This kernel never
materializes a unitary: it applies the raw per-wire 2x2 rotations and CZ
signs directly to the state batch, entirely in VMEM, in ONE kernel for the
whole L x k chain.

Layout: state planes are held TRANSPOSED as (d, B) — the basis index on
sublanes, the batch on lanes. A gate on wire j then only needs
leading-axis reshapes (d, B) -> (left, 2, right, B), which are free (the
tiled trailing dims never change), plus elementwise VPU work. ~O(L k w B d)
flops total vs O(L k d^3) for unitary composition.

The backward is a second kernel walking the chain in reverse: states are
reconstructed through adjoint gates (zero residual memory) and each gate's
(2, 2) gradient is accumulated from plane inner products.

Three kernels live here: ``gate_chain_pallas`` (the re-uploading chain:
|0..0> init + per-layer RZ phase encode, CZ rings — the QIDDM/differN
family), ``ry_chain_pallas`` (the same chain with per-sample RY encoding
— the QIDDM_PL_noise1 family, reference nn/qdense.py:597-617), and
``sel_chain_pallas`` (arbitrary initial states, CNOT or CZ rings — the
Qdense/QNN families). All cap at ``config.pallas_max_wires()``
(scoped-VMEM limit, DESIGN.md width boundary); wider circuits take the
gate-level XLA path in sel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sel import cz_ring_signs, sel_ranges


def _partner(sr, si, bit: int, is1):
    """Partner-row amplitudes s[i ^ bit] via two sublane rolls + select
    (value reshapes with tiny sublane dims pad ~8x and blow VMEM; rolls on
    full (d, B) planes do not)."""
    d = sr.shape[0]
    down_r = pltpu.roll(sr, d - bit, axis=0)   # [i] = s[i + bit] (cyclic)
    down_i = pltpu.roll(si, d - bit, axis=0)
    up_r = pltpu.roll(sr, bit, axis=0)         # [i] = s[i - bit]
    up_i = pltpu.roll(si, bit, axis=0)
    o_r = jnp.where(is1, up_r, down_r)
    o_i = jnp.where(is1, up_i, down_i)
    return o_r, o_i


def _to_g8(rot_mats):
    """Pack complex (..., 2, 2) gate matrices as the kernels' (..., 8)
    float32 real/imag component layout (one definition for every kernel
    that streams gates: sel/gate/ry chains here, the dm block kernel)."""
    return jnp.stack([
        jnp.real(rot_mats[..., 0, 0]), jnp.imag(rot_mats[..., 0, 0]),
        jnp.real(rot_mats[..., 0, 1]), jnp.imag(rot_mats[..., 0, 1]),
        jnp.real(rot_mats[..., 1, 0]), jnp.imag(rot_mats[..., 1, 0]),
        jnp.real(rot_mats[..., 1, 1]), jnp.imag(rot_mats[..., 1, 1]),
    ], axis=-1).astype(jnp.float32)


def _wire_mask(j: int, d: int, B: int, w: int):
    bit_pos = w - 1 - j
    row = jax.lax.broadcasted_iota(jnp.int32, (d, B), 0)
    return ((row >> bit_pos) & 1) == 1


def _gate_apply(sr, si, g8, j: int, d: int, B: int, w: int):
    """Apply one 2x2 complex gate to wire j of (d, B) state planes.

    g8: 8 scalars (g00r, g00i, g01r, g01i, g10r, g10i, g11r, g11i).

    Two formulations:
    * right = d / 2^(j+1) >= 8: leading-axis reshape to (left, 2, right, B)
      and slice — half the elementwise work, no data movement, and the
      tiled (right, B) trailing dims stay unpadded;
    * right < 8: that reshape would pad sublanes up to 8x (VMEM blowup), so
      fetch partner rows with two sublane rolls and blend with masks.
    """
    g00r, g00i, g01r, g01i, g10r, g10i, g11r, g11i = g8
    bit = 1 << (w - 1 - j)
    if bit >= 8:
        left = 2**j
        right = d // (2 * left)
        vr = sr.reshape(left, 2, right, B)
        vi = si.reshape(left, 2, right, B)
        s0r, s1r = vr[:, 0], vr[:, 1]
        s0i, s1i = vi[:, 0], vi[:, 1]
        n0r = g00r * s0r - g00i * s0i + g01r * s1r - g01i * s1i
        n0i = g00r * s0i + g00i * s0r + g01r * s1i + g01i * s1r
        n1r = g10r * s0r - g10i * s0i + g11r * s1r - g11i * s1i
        n1i = g10r * s0i + g10i * s0r + g11r * s1i + g11i * s1r
        sr = jnp.stack([n0r, n1r], axis=1).reshape(d, B)
        si = jnp.stack([n0i, n1i], axis=1).reshape(d, B)
        return sr, si
    is1 = _wire_mask(j, d, B, w)
    o_r, o_i = _partner(sr, si, bit, is1)
    n_r0 = g00r * sr - g00i * si + g01r * o_r - g01i * o_i
    n_i0 = g00r * si + g00i * sr + g01r * o_i + g01i * o_r
    n_r1 = g10r * o_r - g10i * o_i + g11r * sr - g11i * si
    n_i1 = g10r * o_i + g10i * o_r + g11r * si + g11i * sr
    return jnp.where(is1, n_r1, n_r0), jnp.where(is1, n_i1, n_i0)


def _adjoint(g8):
    g00r, g00i, g01r, g01i, g10r, g10i, g11r, g11i = g8
    return (g00r, -g00i, g10r, -g10i, g01r, -g01i, g11r, -g11i)


def _read_g8(g_ref, l, j: int):
    return tuple(g_ref[l, j, t] for t in range(8))


def _select_signs(sgn_ref, l, k: int):
    """CZ sign plane for layer l. Ranges cycle with period k, so the k
    static (d, 1) planes are selected with scalar predicates (Mosaic cannot
    lane-slice at a dynamic unaligned index)."""
    sg = sgn_ref[0]
    for li in range(1, k):
        sg = jnp.where(l % k == li, sgn_ref[li], sg)
    return sg


def _fwd_kernel(k: int, w: int, n_layers: int,
                pr_ref, pi_ref, g_ref, sgn_ref, or_ref, oi_ref):
    d, B = pr_ref.shape

    def body(l, carry):
        sr, si = carry

        def phased(sr, si):
            tr = sr * pr_ref[:] - si * pi_ref[:]
            ti = sr * pi_ref[:] + si * pr_ref[:]
            return tr, ti

        sr, si = jax.lax.cond(l % k == 0, phased,
                              lambda a, b: (a, b), sr, si)
        for j in range(w):
            sr, si = _gate_apply(sr, si, _read_g8(g_ref, l, j), j, d, B, w)
        sg = _select_signs(sgn_ref, l, k)
        return sr * sg, si * sg

    row = jax.lax.broadcasted_iota(jnp.int32, (d, B), 0)
    sr = jnp.where(row == 0, 1.0, 0.0).astype(jnp.float32)
    si = jnp.zeros((d, B), jnp.float32)
    sr, si = jax.lax.fori_loop(0, n_layers, body, (sr, si))
    or_ref[:] = sr
    oi_ref[:] = si


def _plane_dg(cr, ci, sr_in, si_in, j: int, d: int, B: int, w: int):
    """(8,) gate gradient from the cotangent (OUT side) and the
    reconstructed INPUT state: dg[x, y] = sum over rows with wire-bit x of
    c * pairing(state value of the y side)."""
    bit = 1 << (w - 1 - j)
    if bit >= 8:
        left = 2**j
        right = d // (2 * left)
        c_r = cr.reshape(left, 2, right, B)
        c_i = ci.reshape(left, 2, right, B)
        s_r = sr_in.reshape(left, 2, right, B)
        s_i = si_in.reshape(left, 2, right, B)
        out = []
        for x in range(2):
            for y in range(2):
                out.append(jnp.sum(c_r[:, x] * s_r[:, y]
                                   + c_i[:, x] * s_i[:, y]))
                out.append(jnp.sum(c_i[:, x] * s_r[:, y]
                                   - c_r[:, x] * s_i[:, y]))
        return jnp.stack(out)
    is1 = _wire_mask(j, d, B, w)
    o_r, o_i = _partner(sr_in, si_in, bit, is1)
    zero = jnp.zeros_like(cr)
    # products against the own-row state (y == x) and the partner (y != x)
    own_r = cr * sr_in + ci * si_in
    own_i = ci * sr_in - cr * si_in
    oth_r = cr * o_r + ci * o_i
    oth_i = ci * o_r - cr * o_i
    dg00r = jnp.sum(jnp.where(is1, zero, own_r))
    dg00i = jnp.sum(jnp.where(is1, zero, own_i))
    dg01r = jnp.sum(jnp.where(is1, zero, oth_r))
    dg01i = jnp.sum(jnp.where(is1, zero, oth_i))
    dg10r = jnp.sum(jnp.where(is1, oth_r, zero))
    dg10i = jnp.sum(jnp.where(is1, oth_i, zero))
    dg11r = jnp.sum(jnp.where(is1, own_r, zero))
    dg11i = jnp.sum(jnp.where(is1, own_i, zero))
    return jnp.stack([dg00r, dg00i, dg01r, dg01i,
                      dg10r, dg10i, dg11r, dg11i])


def _bwd_kernel(k: int, w: int, n_layers: int,
                pr_ref, pi_ref, g_ref, sgn_ref, fr_ref, fi_ref,
                gr_ref, gi_ref, dg_ref, dpr_ref, dpi_ref):
    d, B = pr_ref.shape

    def body(i, carry):
        sr, si, cr, ci, dpr, dpi = carry
        l = n_layers - 1 - i
        sg = _select_signs(sgn_ref, l, k)
        sr, si = sr * sg, si * sg      # CZ is self-inverse
        cr, ci = cr * sg, ci * sg
        for j in range(w - 1, -1, -1):
            adj = _adjoint(_read_g8(g_ref, l, j))
            sr, si = _gate_apply(sr, si, adj, j, d, B, w)   # input state
            dg_ref[pl.ds(l, 1), j, :] = _plane_dg(
                cr, ci, sr, si, j, d, B, w).reshape(1, 8)
            cr, ci = _gate_apply(cr, ci, adj, j, d, B, w)   # cotangent

        def unphase(args):
            sr, si, cr, ci, dpr, dpi = args
            pr_, pi_ = pr_ref[:], pi_ref[:]
            spr = sr * pr_ + si * pi_    # state before the phase
            spi = si * pr_ - sr * pi_
            dpr = dpr + cr * spr + ci * spi
            dpi = dpi + ci * spr - cr * spi
            crn = cr * pr_ + ci * pi_
            cin = ci * pr_ - cr * pi_
            return spr, spi, crn, cin, dpr, dpi

        sr, si, cr, ci, dpr, dpi = jax.lax.cond(
            l % k == 0, unphase, lambda a: a, (sr, si, cr, ci, dpr, dpi))
        return sr, si, cr, ci, dpr, dpi

    zeros = jnp.zeros((d, B), jnp.float32)
    carry = (fr_ref[:], fi_ref[:], gr_ref[:], gi_ref[:], zeros, zeros)
    _, _, _, _, dpr, dpi = jax.lax.fori_loop(0, n_layers, body, carry)
    dpr_ref[:] = dpr
    dpi_ref[:] = dpi


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gate_chain(pr, pi, g8, signs, k: int, w: int, interpret: bool):
    return _gate_chain_fwd_call(pr, pi, g8, signs, k, w, interpret)


def _gate_chain_fwd_call(pr, pi, g8, signs, k, w, interpret):
    d, B = pr.shape
    n_layers = g8.shape[0]
    kern = functools.partial(_fwd_kernel, k, w, n_layers)
    return pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
        ],
        interpret=interpret,
    )(pr, pi, g8, signs)


def _gate_chain_fwd(pr, pi, g8, signs, k, w, interpret):
    out = _gate_chain_fwd_call(pr, pi, g8, signs, k, w, interpret)
    return out, (pr, pi, g8, signs, out[0], out[1])


def _gate_chain_bwd(k, w, interpret, res, g):
    pr, pi, g8, signs, fr, fi = res
    gr, gi = g
    d, B = pr.shape
    n_layers = g8.shape[0]
    kern = functools.partial(_bwd_kernel, k, w, n_layers)
    dg, dpr, dpi = pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_layers, w, 8), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
        ],
        interpret=interpret,
    )(pr, pi, g8, signs, fr, fi, gr, gi)
    return dpr, dpi, dg, None


_gate_chain.defvjp(_gate_chain_fwd, _gate_chain_bwd)


def _cnot_apply(sr, si, c: int, t: int, d: int, B: int, w: int):
    """CNOT(control wire c, target wire t) on (d, B) planes: rows with the
    control bit set take their target-bit partner's amplitude."""
    tbit = 1 << (w - 1 - t)
    is1_t = _wire_mask(t, d, B, w)
    o_r, o_i = _partner(sr, si, tbit, is1_t)
    mask_c = _wire_mask(c, d, B, w)
    return jnp.where(mask_c, o_r, sr), jnp.where(mask_c, o_i, si)


def _ring_apply(sr, si, q: int, w: int, is_cz: bool, sgn_ref, d, B,
                inverse: bool = False):
    """The layer's imprimitive ring (range r = q + 1, all bits static).

    CZ rings are diagonal (self-inverse, order-free); CNOT rings apply
    CNOT(j, (j+r) mod w) sequentially, so the inverse reverses gate order.
    """
    if w == 1:
        return sr, si
    if is_cz:
        sg = sgn_ref[q]
        return sr * sg, si * sg
    r = q + 1
    order = range(w - 1, -1, -1) if inverse else range(w)
    for j in order:
        sr, si = _cnot_apply(sr, si, j, (j + r) % w, d, B, w)
    return sr, si


def _ring_apply_dyn(sr, si, ridx, w: int, is_cz: bool, sgn_ref, d, B,
                    inverse: bool = False):
    """Ring for a TRACED in-period position ``ridx = l % (w-1)``.

    CZ: sign plane selected with scalar predicates (as _select_signs).
    CNOT: ``lax.switch`` over the w-1 static ring variants — alternatives,
    so the kernel's stack holds ONE ring's temporaries, not all of them
    (a statically unrolled period blew the 16M scoped-vmem limit at
    w=10, B=11)."""
    if w == 1:
        return sr, si
    p = w - 1
    if is_cz:
        sg = sgn_ref[0]
        for q in range(1, p):
            sg = jnp.where(ridx == q, sgn_ref[q], sg)
        return sr * sg, si * sg
    if p == 1:
        return _ring_apply(sr, si, 0, w, is_cz, sgn_ref, d, B, inverse)
    return jax.lax.switch(
        ridx,
        [functools.partial(_ring_apply, q=q, w=w, is_cz=is_cz,
                           sgn_ref=sgn_ref, d=d, B=B, inverse=inverse)
         for q in range(p)],
        sr, si)


def _sel_fwd_kernel(w: int, depth: int, is_cz: bool,
                    sr0_ref, si0_ref, g_ref, sgn_ref, or_ref, oi_ref):
    """ONE layer per fori_loop iteration (constant program size in depth,
    minimal VMEM stack); the range cycle is resolved dynamically from
    ``l % (w-1)``."""
    d, B = sr0_ref.shape
    p = max(w - 1, 1)

    def body(l, carry):
        sr, si = carry
        for j in range(w):
            sr, si = _gate_apply(sr, si, _read_g8(g_ref, l, j), j, d, B, w)
        return _ring_apply_dyn(sr, si, l % p, w, is_cz, sgn_ref, d, B)

    sr, si = jax.lax.fori_loop(0, depth, body, (sr0_ref[:], si0_ref[:]))
    or_ref[:] = sr
    oi_ref[:] = si


def _sel_bwd_kernel(w: int, depth: int, is_cz: bool,
                    g_ref, sgn_ref, fr_ref, fi_ref,
                    gr_ref, gi_ref, dg_ref, dsr_ref, dsi_ref):
    d, B = fr_ref.shape
    p = max(w - 1, 1)

    def body(i, carry):
        sr, si, cr, ci = carry
        l = depth - 1 - i
        ridx = l % p
        sr, si = _ring_apply_dyn(sr, si, ridx, w, is_cz, sgn_ref, d, B,
                                 inverse=True)
        cr, ci = _ring_apply_dyn(cr, ci, ridx, w, is_cz, sgn_ref, d, B,
                                 inverse=True)
        for j in range(w - 1, -1, -1):
            adj = _adjoint(_read_g8(g_ref, l, j))
            sr, si = _gate_apply(sr, si, adj, j, d, B, w)
            dg_ref[pl.ds(l, 1), j, :] = _plane_dg(
                cr, ci, sr, si, j, d, B, w).reshape(1, 8)
            cr, ci = _gate_apply(cr, ci, adj, j, d, B, w)
        return sr, si, cr, ci

    carry = (fr_ref[:], fi_ref[:], gr_ref[:], gi_ref[:])
    _, _, cr, ci = jax.lax.fori_loop(0, depth, body, carry)
    dsr_ref[:] = cr
    dsi_ref[:] = ci


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sel_chain(sr, si, g8, w: int, is_cz: bool, interpret: bool):
    return _sel_chain_fwd_call(sr, si, g8, w, is_cz, interpret)


def _sel_signs(w: int) -> jnp.ndarray:
    p = max(w - 1, 1)
    return jnp.asarray(np.stack(
        [cz_ring_signs(w, (q + 1) if w > 1 else 0)[:, None]
         for q in range(p)]).astype(np.float32))


# the per-layer loop body (w gate applies + a ring) allocates transient
# (d, B) planes on the kernel's VMEM stack; Mosaic's conservative liveness
# puts the deep-chain worst case slightly over the 16M default scoped
# limit (16.19M observed at w=10, B=11, depth=60) — raise it, the state
# buffers themselves are tiny next to it
_SEL_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _sel_chain_fwd_call(sr, si, g8, w, is_cz, interpret):
    d, B = sr.shape
    depth = g8.shape[0]
    kern = functools.partial(_sel_fwd_kernel, w, depth, is_cz)
    return pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
        ],
        interpret=interpret,
    )(sr, si, g8, _sel_signs(w))


def _sel_chain_fwd(sr, si, g8, w, is_cz, interpret):
    out = _sel_chain_fwd_call(sr, si, g8, w, is_cz, interpret)
    # residuals: gates + OUTPUT planes only — the backward reconstructs
    # every intermediate (and the input cotangent) by walking the chain in
    # reverse through adjoint gates; keeping the input planes alive too
    # would be dead residual memory and VMEM traffic.
    return out, (g8, out[0], out[1])


def _sel_chain_bwd(w, is_cz, interpret, res, g):
    g8, fr, fi = res
    gr, gi = g
    d, B = fr.shape
    depth = g8.shape[0]
    kern = functools.partial(_sel_bwd_kernel, w, depth, is_cz)
    dg, dsr, dsi = pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((depth, w, 8), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
        ],
        interpret=interpret,
    )(g8, _sel_signs(w), fr, fi, gr, gi)
    return dsr, dsi, dg


_sel_chain.defvjp(_sel_chain_fwd, _sel_chain_bwd)


def sel_chain_pallas(states, rot_mats, wires: int, imprimitive: str = "cnot",
                     interpret: bool = False):
    """Fused SEL chain on an ARBITRARY initial state batch.

    The Qdense/QNN-family counterpart of :func:`gate_chain_pallas`: no
    re-encoding between layers, initial state supplied by the caller
    (amplitude embedding / RY product states), imprimitive rings CNOT or CZ
    with the full-depth range cycle ``r_l = (l mod (wires-1)) + 1``
    (reference ``qml.StronglyEntanglingLayers`` defaults; SEL semantics in
    sel.py). states: (B, d) complex; rot_mats: (depth, wires, 2, 2) complex.
    Returns (B, d) complex. Differentiable in both inputs via a
    reverse-walk backward kernel (adjoint-gate state reconstruction, zero
    residual memory).
    """
    if imprimitive not in ("cnot", "cz"):
        raise ValueError(f"unknown imprimitive {imprimitive!r}")
    depth = rot_mats.shape[0]
    g8 = _to_g8(rot_mats)  # (depth, wires, 8)
    sr = jnp.real(states).astype(jnp.float32).T  # (d, B)
    si = jnp.imag(states).astype(jnp.float32).T
    out_r, out_i = _sel_chain(sr, si, g8, wires, imprimitive == "cz",
                              interpret)
    return (out_r + 1j * out_i).T


def _amp_damp_kernel(w: int, sr_ref, si_ref, u_ref, g_ref, or_ref, oi_ref):
    """Whole amplitude-damping trajectory channel pass (all ``w`` wires,
    sequential conditional branch sampling) with the state VMEM-resident:
    one HBM read + one write instead of the XLA loop's ~2 full-state
    passes per wire (sim/trajectories.py::_amp_damp_xla, the twin whose
    semantics this kernel mirrors).

    Per wire j: the norm-weighted branch probability p1 = g * P(bit_j=1)
    is a masked plane reduction; the presampled uniform row u[j] picks the
    branch per LANE (sample); both Kraus branches are diagonal-or-shift,
    so the update is a lane-row-coefficient blend (no 2x2 contraction):
    bit0 rows become pick1 ? sqrt(g)/sqrt(p1) * partner : val/sqrt(1-p1),
    bit1 rows become pick1 ? 0 : sqrt(1-g)/sqrt(1-p1) * val.
    """
    d, B = sr_ref.shape
    g = g_ref[0]
    sqg = jnp.sqrt(jnp.maximum(g, 0.0))
    sq1g = jnp.sqrt(jnp.maximum(1.0 - g, 0.0))
    sr, si = sr_ref[:], si_ref[:]
    for j in range(w):
        bit = 1 << (w - 1 - j)
        is1 = _wire_mask(j, d, B, w)
        prob1 = jnp.sum(jnp.where(is1, sr * sr + si * si, 0.0),
                        axis=0, keepdims=True)            # (1, B)
        p1 = g * prob1
        pick1 = u_ref[j:j + 1, :] < p1                    # (1, B)
        # branch gates renormalized K_i / sqrt(p_i), clamps as in the twin
        c1 = sqg * jax.lax.rsqrt(jnp.maximum(p1, 1e-30))
        c0 = jax.lax.rsqrt(jnp.maximum(1.0 - p1, 1e-30))
        c0g = c0 * sq1g
        if bit >= 8:
            left = 2**j
            right = d // (2 * left)
            vr = sr.reshape(left, 2, right, B)
            vi = si.reshape(left, 2, right, B)
            s0r, s1r = vr[:, 0], vr[:, 1]
            s0i, s1i = vi[:, 0], vi[:, 1]
            pk = pick1.reshape(1, 1, B)
            a1 = c1.reshape(1, 1, B)
            a0 = c0.reshape(1, 1, B)
            a0g = c0g.reshape(1, 1, B)
            n0r = jnp.where(pk, a1 * s1r, a0 * s0r)
            n0i = jnp.where(pk, a1 * s1i, a0 * s0i)
            n1r = jnp.where(pk, 0.0, a0g * s1r)
            n1i = jnp.where(pk, 0.0, a0g * s1i)
            sr = jnp.stack([n0r, n1r], axis=1).reshape(d, B)
            si = jnp.stack([n0i, n1i], axis=1).reshape(d, B)
        else:
            o_r, o_i = _partner(sr, si, bit, is1)
            n_r0 = jnp.where(pick1, c1 * o_r, c0 * sr)
            n_i0 = jnp.where(pick1, c1 * o_i, c0 * si)
            n_r1 = jnp.where(pick1, 0.0, c0g * sr)
            n_i1 = jnp.where(pick1, 0.0, c0g * si)
            sr = jnp.where(is1, n_r1, n_r0)
            si = jnp.where(is1, n_i1, n_i0)
    or_ref[:] = sr
    oi_ref[:] = si


def amp_damp_call_planes(sr, si, u, g, w: int, interpret: bool = False):
    """Raw plane-level kernel call: sr/si (d, B) f32, u (w, B) f32
    presampled uniforms, g (1,) f32 strength (traced OK). Returns (d, B)
    out planes. Chunking/custom-VJP live in the trajectory wrapper
    (sim/trajectories.py::_amp_damp_fused)."""
    d, B = sr.shape
    kern = functools.partial(_amp_damp_kernel, w)
    return pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
        ],
        interpret=interpret,
    )(sr, si, u, g)


def sel_chain_pallas_tiled(states, rot_mats, wires: int,
                           imprimitive: str = "cnot", tile: int = 128,
                           interpret: bool = False):
    """:func:`sel_chain_pallas` for batches too large for one VMEM-resident
    ``(d, B)`` block: pad the batch to a multiple of ``tile`` lanes and
    ``lax.map`` the fused kernel over the row chunks (a scan, NOT a vmap —
    jax's default pallas batching rule kernel-faults the TPU worker, see
    engine._batch_traced).

    The trajectory backend's wide-chain route (sim/trajectories.py): at
    n_traj * batch states the whole batch cannot sit in VMEM at once, but
    each ``(2**w, tile)`` chunk can, so every chunk pays one HBM read +
    one write for the full k-layer chain instead of the gate-level XLA
    route's ~2 passes per gate. Gradients flow through the scan into both
    ``states`` and the (closed-over, chunk-shared) ``rot_mats``.
    """
    B = states.shape[0]
    if B <= tile:
        return sel_chain_pallas(states, rot_mats, wires,
                                imprimitive=imprimitive, interpret=interpret)
    n_chunks = -(-B // tile)
    pad = n_chunks * tile - B
    st = jnp.pad(states, ((0, pad), (0, 0))) if pad else states
    st = st.reshape(n_chunks, tile, states.shape[1])
    out = jax.lax.map(
        lambda s: sel_chain_pallas(s, rot_mats, wires,
                                   imprimitive=imprimitive,
                                   interpret=interpret), st)
    out = out.reshape(n_chunks * tile, states.shape[1])
    return out[:B] if pad else out


def _sign_planes(k: int, wires: int):
    """The k static CZ-ring sign planes (ranges cycle per block), (k, d, 1)."""
    ranges = sel_ranges(k, wires)
    return np.stack([cz_ring_signs(wires, ranges[li])[:, None]
                     for li in range(k)]).astype(np.float32)


def gate_chain_planes(pr, pi, rot_mats, k: int, wires: int,
                      interpret: bool = False):
    """Plane-level re-uploading chain: (d, B) float32 phase planes in,
    (d, B) float32 state planes out — the kernel's NATIVE layout.

    The complex-array wrapper (:func:`gate_chain_pallas`) assembles
    ``(B, d)`` complex states at the boundary; when the caller then splits
    them straight back into real planes (readout is ``|psi|^2`` or a
    PauliZ marginal), XLA materializes the assembly, the (B, d) <-> (d, B)
    transposes, and their VJP twins — measured ~0.4 ms/block fwd+bwd at
    d=1024, B=80, ~40% of the whole differN training step. The engine's
    hot path (engine.reupload_block) therefore stays in planes end to
    end via this entry point.
    """
    g8 = _to_g8(rot_mats)  # (n_layers, wires, 8)
    return _gate_chain(pr, pi, g8, jnp.asarray(_sign_planes(k, wires)),
                       k, wires, interpret)


def gate_chain_pallas(phases, rot_mats, k: int, wires: int,
                      interpret: bool = False):
    """Run the full re-uploading chain gate-by-gate, fused.

    phases: (B, d) complex RZ-phase diagonal (applied before every k-th
    layer); rot_mats: (n_layers, wires, 2, 2) complex per-wire rotations
    (layer = one SEL layer; CZ ring with the per-block cycling ranges is
    applied after each layer's rotations). Returns (B, d) complex states.
    """
    pr = jnp.real(phases).astype(jnp.float32).T  # (d, B)
    pi = jnp.imag(phases).astype(jnp.float32).T
    out_r, out_i = gate_chain_planes(pr, pi, rot_mats, k, wires, interpret)
    return (out_r + 1j * out_i).T  # (B, d)


# --- RY-encoded re-uploading chain (QIDDM_PL_noise1 family) ----------------
#
# The encode is a per-wire RY(x[b, j]) instead of an RZ phase diagonal:
# real 2x2 rotations whose cos/sin coefficients differ PER SAMPLE. In the
# transposed (d, B) layout the batch lives on lanes, so the coefficients
# enter as (1, B) lane-broadcast rows — the same trick the fused dm kernel
# uses (pallas_dm_kernel._lane_coeff_gate_row).


def _ry_apply(sr, si, c, s, j: int, d: int, B: int, w: int):
    """RY with per-lane real coefficients on wire j of (d, B) planes.

    RY = [[c, -s], [s, c]] applied per sample: rows with wire bit 0 get
    c*own - s*partner, rows with bit 1 get c*own + s*partner. Passing -s
    applies the adjoint (RY is real orthogonal)."""
    bit = 1 << (w - 1 - j)
    is1 = _wire_mask(j, d, B, w)
    o_r, o_i = _partner(sr, si, bit, is1)
    sgn = jnp.where(is1, s, -s)
    return c * sr + sgn * o_r, c * si + sgn * o_i


def _ry_fwd_kernel(k: int, w: int, n_layers: int,
                   cs_ref, g_ref, sgn_ref, or_ref, oi_ref):
    d, B = or_ref.shape

    def body(l, carry):
        sr, si = carry

        def encoded(sr, si):
            for j in range(w):
                c = cs_ref[j:j + 1, :]
                s = cs_ref[w + j:w + j + 1, :]
                sr, si = _ry_apply(sr, si, c, s, j, d, B, w)
            return sr, si

        sr, si = jax.lax.cond(l % k == 0, encoded,
                              lambda a, b: (a, b), sr, si)
        for j in range(w):
            sr, si = _gate_apply(sr, si, _read_g8(g_ref, l, j), j, d, B, w)
        sg = _select_signs(sgn_ref, l, k)
        return sr * sg, si * sg

    row = jax.lax.broadcasted_iota(jnp.int32, (d, B), 0)
    sr = jnp.where(row == 0, 1.0, 0.0).astype(jnp.float32)
    si = jnp.zeros((d, B), jnp.float32)
    sr, si = jax.lax.fori_loop(0, n_layers, body, (sr, si))
    or_ref[:] = sr
    oi_ref[:] = si


def _ry_bwd_kernel(k: int, w: int, n_layers: int,
                   cs_ref, g_ref, sgn_ref, fr_ref, fi_ref,
                   gr_ref, gi_ref, dg_ref, dcs_ref):
    """Reverse walk (adjoint-gate state reconstruction, zero residuals).

    Encode gradients: for n = c*v_own + sign*s*v_partner per row,
    dc[b] = sum_rows(ct . v_own) and ds[b] = sum_rows(sign * ct . v_partner)
    — lane-wise sublane reductions accumulated across the L re-uploads into
    a (2w, B) carry plane (rows 0..w-1 = dcos_j, w..2w-1 = dsin_j)."""
    d, B = fr_ref.shape

    def body(i, carry):
        sr, si, cr, ci, dcs = carry
        l = n_layers - 1 - i
        sg = _select_signs(sgn_ref, l, k)
        sr, si = sr * sg, si * sg      # CZ is self-inverse
        cr, ci = cr * sg, ci * sg
        for j in range(w - 1, -1, -1):
            adj = _adjoint(_read_g8(g_ref, l, j))
            sr, si = _gate_apply(sr, si, adj, j, d, B, w)   # input state
            dg_ref[pl.ds(l, 1), j, :] = _plane_dg(
                cr, ci, sr, si, j, d, B, w).reshape(1, 8)
            cr, ci = _gate_apply(cr, ci, adj, j, d, B, w)   # cotangent

        def unencode(args):
            sr, si, cr, ci, dcs = args
            # RYs on distinct wires commute; walk j high->low anyway so the
            # cotangent at each gate's output is exact. Per-wire grads are
            # collected as (1, B) rows and concatenated into one (2w, B)
            # update — `.at[j].add` would lower to scatter-add, which
            # Mosaic has no TPU rule for (static-slice concat is free).
            dc_rows = [None] * w
            ds_rows = [None] * w
            for j in range(w - 1, -1, -1):
                c = cs_ref[j:j + 1, :]
                s = cs_ref[w + j:w + j + 1, :]
                sr, si = _ry_apply(sr, si, c, -s, j, d, B, w)  # input state
                bit = 1 << (w - 1 - j)
                is1 = _wire_mask(j, d, B, w)
                o_r, o_i = _partner(sr, si, bit, is1)
                dc_rows[j] = jnp.sum(cr * sr + ci * si, axis=0, keepdims=True)
                psn = jnp.where(is1, 1.0, -1.0)
                ds_rows[j] = jnp.sum(psn * (cr * o_r + ci * o_i),
                                     axis=0, keepdims=True)
                cr, ci = _ry_apply(cr, ci, c, -s, j, d, B, w)
            dcs = dcs + jnp.concatenate(dc_rows + ds_rows, axis=0)
            return sr, si, cr, ci, dcs

        return jax.lax.cond(l % k == 0, unencode, lambda a: a,
                            (sr, si, cr, ci, dcs))

    zeros = jnp.zeros(dcs_ref.shape, jnp.float32)
    carry = (fr_ref[:], fi_ref[:], gr_ref[:], gi_ref[:], zeros)
    _, _, _, _, dcs = jax.lax.fori_loop(0, n_layers, body, carry)
    dcs_ref[:] = dcs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ry_chain(cs, g8, signs, k: int, w: int, interpret: bool):
    return _ry_chain_fwd_call(cs, g8, signs, k, w, interpret)


def _ry_chain_fwd_call(cs, g8, signs, k, w, interpret):
    d = 2**w
    B = cs.shape[1]
    n_layers = g8.shape[0]
    kern = functools.partial(_ry_fwd_kernel, k, w, n_layers)
    return pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, B), jnp.float32),
            jax.ShapeDtypeStruct((d, B), jnp.float32),
        ],
        interpret=interpret,
    )(cs, g8, signs)


def _ry_chain_fwd(cs, g8, signs, k, w, interpret):
    out = _ry_chain_fwd_call(cs, g8, signs, k, w, interpret)
    return out, (cs, g8, signs, out[0], out[1])


def _ry_chain_bwd(k, w, interpret, res, g):
    cs, g8, signs, fr, fi = res
    gr, gi = g
    d, B = fr.shape
    n_layers = g8.shape[0]
    kern = functools.partial(_ry_bwd_kernel, k, w, n_layers)
    dg, dcs = pl.pallas_call(
        kern,
        compiler_params=_SEL_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_layers, w, 8), jnp.float32),
            jax.ShapeDtypeStruct((2 * w, B), jnp.float32),
        ],
        interpret=interpret,
    )(cs, g8, signs, fr, fi, gr, gi)
    return dcs, dg, None


_ry_chain.defvjp(_ry_chain_fwd, _ry_chain_bwd)


def ry_chain_planes(angles, rot_mats, k: int, wires: int,
                    interpret: bool = False):
    """Plane-level RY-encoded chain: (d, B) float32 state planes out (see
    :func:`gate_chain_planes` for why the engine consumes planes)."""
    g8 = _to_g8(rot_mats)  # (n_layers, wires, 8)
    half = (0.5 * angles).astype(jnp.float32).T      # (w, B)
    cs = jnp.concatenate([jnp.cos(half), jnp.sin(half)], axis=0)  # (2w, B)
    return _ry_chain(cs, g8, jnp.asarray(_sign_planes(k, wires)),
                     k, wires, interpret)


def ry_chain_pallas(angles, rot_mats, k: int, wires: int,
                    interpret: bool = False):
    """Fused RY-encoded re-uploading chain (QIDDM_PL_noise1 family).

    Same chain as :func:`gate_chain_pallas` but the per-layer encode is a
    per-wire RY(angles[b, j]) product (reference nn/qdense.py:597-617)
    instead of an RZ phase diagonal. angles: (B, wires) real; rot_mats:
    (n_layers, wires, 2, 2) complex. Returns (B, d) complex states.
    Differentiable in both inputs (the custom VJP returns cos/sin-plane
    gradients; autodiff chains them through the cos/sin below back to the
    angles, i.e. through any down-projection).
    """
    out_r, out_i = ry_chain_planes(angles, rot_mats, k, wires, interpret)
    return (out_r + 1j * out_i).T  # (B, d)
