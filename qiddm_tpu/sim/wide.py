"""Wide-circuit (11+ wire) gate chains via grouped Kronecker contractions.

The single-chip wide regime — beyond the fused Pallas kernels' Mosaic
width cap (config.pallas_max_wires) — previously applied SEL sublayers
gate by gate (sim/adjoint.py): ``wires`` separate single-qubit einsum
passes over the full (batch, 2**w) state per sublayer, each one a
bandwidth-bound HBM round trip. This module replaces the per-wire loop
with *grouped* contractions: the w per-wire rotations of one sublayer
are Kronecker-composed into ceil(w / 7) group matrices of at most
128 x 128 (the MXU tile edge) and applied as batched matmuls over
reshaped state axes — 3 HBM passes instead of 20 at w=20. Measured on
the v5e (tools/bench_wide_micro.py): 3.9 ms vs 61.7 ms per sublayer at
(w=20, B=8), a 15.6x forward win, with balanced group splits because
sub-128 contraction dims pad badly on the MXU (a 16 x 16 group einsum is
*slower* than 128 x 128 at the same state size).

This is the TPU answer to what PennyLane-Lightning's C++ adjoint does
for the reference at width (reference nn/qdense.py:237): differentiation
is adjoint-mode (O(1) residuals) — the custom-VJP backward reconstructs
intermediate states through group inverses (unitarity makes that exact)
instead of storing them, so 20+-wire training fits in HBM. Cotangent
conventions match sim/adjoint.py (JAX transposes complex-linear ops
WITHOUT conjugation: cotangents push through a group as ``G^T c``, state
reconstruction uses the true inverse ``G^H``, and a group's own
cotangent is ``dG[x, y] = sum c_out[.., x, ..] * s_in[.., y, ..]``).

The group matrices themselves are assembled OUTSIDE the custom VJP
(sel._batched_kron_chain on the per-wire (2, 2) gates — tiny tensors),
so plain autodiff carries ``dG -> per-gate dU -> rotation angles`` and
the hand-written backward stays minimal. Ring imprimitives reuse the
deduplicated static tables of sim/adjoint.py (CZ: sign diagonals; CNOT:
permutation gathers — one extra elementwise/gather pass per sublayer).

Routing: engine.py prefers this chain on TPU above the Pallas width cap
(config.wide_mode "auto"); "on" forces it everywhere (CPU parity tests),
"off" falls back to the per-gate adjoint path. Parity is pinned against
sim/adjoint.py and plain autodiff in tests/test_wide.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import config as _config
from .adjoint import _apply_ring, _ring_tables
from .gates import rot_matrix
from .sel import _batched_kron_chain


def group_sizes(wires: int, max_bits: int = 7) -> tuple[int, ...]:
    """Balanced wire partition with every group <= ``max_bits``.

    Balanced, not greedy: greedy [7, 7, 2] leaves a 4 x 4 group matrix
    whose einsum pads to the 128-lane MXU tile and runs ~4x slower than
    the 64 x 64 of balanced [7, 7, 6] / [6, 5, 5] splits (measured,
    tools/bench_wide_micro.py m-sweep)."""
    if wires <= 0:
        raise ValueError(f"wires must be positive, got {wires}")
    n = -(-wires // max_bits)
    base, rem = divmod(wires, n)
    return tuple(base + (1 if i < rem else 0) for i in range(n))


def _offsets(sizes) -> tuple[int, ...]:
    offs, o = [], 0
    for s in sizes:
        offs.append(o)
        o += s
    return tuple(offs)


def _apply_group(states, g, off: int, size: int, wires: int):
    """Contract one group matrix against the state's [off, off+size) bit
    axis. states: (B, 2**w); g: (2**s, 2**s) shared or (B, 2**s, 2**s)
    per-sample (RY encodings)."""
    b = states.shape[0]
    pre = 2**off
    post = 2 ** (wires - off - size)
    v = states.reshape(b, pre, 2**size, post)
    prec = _config.matmul_precision()
    if g.ndim == 2:
        out = jnp.einsum("xy,bpyq->bpxq", g, v, precision=prec)
    else:
        out = jnp.einsum("bxy,bpyq->bpxq", g, v, precision=prec)
    return out.reshape(b, -1)


def _group_dg(ct, s_in, off: int, size: int, wires: int, batched: bool):
    """Group cotangent dG = sum_{b,p,q} ct[..x..] s_in[..y..] (JAX's
    unconjugated convention); per-sample (B, 2**s, 2**s) when batched."""
    b = ct.shape[0]
    pre = 2**off
    post = 2 ** (wires - off - size)
    c = ct.reshape(b, pre, 2**size, post)
    s = s_in.reshape(b, pre, 2**size, post)
    spec = "bpxq,bpyq->bxy" if batched else "bpxq,bpyq->xy"
    return jnp.einsum(spec, c, s, precision=_config.matmul_precision())


def _adjT(g):
    """Conjugate transpose (true inverse of a unitary), any batching."""
    return jnp.conj(jnp.swapaxes(g, -1, -2))


def _swapT(g):
    """Unconjugated transpose (JAX cotangent push), any batching."""
    return jnp.swapaxes(g, -1, -2)


def group_gates(mats, sizes):
    """Kronecker-compose per-wire gates into group matrices.

    mats: (..., wires, 2, 2) -> tuple over groups of (..., 2**s, 2**s).
    Differentiable (plain autodiff); tiny tensors, so the assembly costs
    nothing next to the state contractions."""
    out = []
    for off, s in zip(_offsets(sizes), sizes):
        out.append(_batched_kron_chain(mats[..., off:off + s, :, :]))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _make_wide_chain(L: int, k: int, wires: int, imprimitive: str,
                     encode_kind: str, full_cycle: bool, sizes: tuple):
    """Custom-VJP grouped chain for one static configuration.

    Returns ``chain(states0, enc, gs) -> states`` where states0 is
    (B, 2**w); enc is (B, 2**w) RZ phases | a tuple of per-sample RY
    group gates (B, 2**s, 2**s) | a 0-size placeholder for "none"; gs is
    a tuple over groups of (L, k, 2**s, 2**s) composed sublayer group
    matrices. Gradients flow to all three; ring rows are closure
    constants. Residuals are O(1): final state + enc + gs.
    """
    offs = _offsets(sizes)
    ring_kind, tab_np, idx_np = _ring_tables(L, k, wires, imprimitive,
                                             full_cycle)
    uniform = not full_cycle

    def _row(tab, idx_l, li: int, slot: int):
        if uniform:
            return tab[int(idx_np[0, li]), slot]
        return jnp.take(tab, idx_l[li], axis=0)[slot]

    def _encode(s, enc):
        if encode_kind == "rz":
            return s * enc
        if encode_kind == "ry":
            for gi, (off, sz) in enumerate(zip(offs, sizes)):
                s = _apply_group(s, enc[gi], off, sz, wires)
        return s

    def fwd_impl(states0, enc, gs):
        tab = None if ring_kind == "none" else jnp.asarray(tab_np)
        idx_xs = (None if (ring_kind == "none" or uniform)
                  else jnp.asarray(idx_np))

        def body(s, xs):
            gs_l, idx_l = xs  # tuple of (k, 2**s, 2**s), (k,) | None
            s = _encode(s, enc)
            for li in range(k):
                for gi, (off, sz) in enumerate(zip(offs, sizes)):
                    s = _apply_group(s, gs_l[gi][li], off, sz, wires)
                if ring_kind != "none":
                    s = _apply_ring(s, _row(tab, idx_l, li, 0), ring_kind)
            return s, None

        s, _ = jax.lax.scan(body, states0, (gs, idx_xs))
        return s

    @jax.custom_vjp
    def chain(states0, enc, gs):
        return fwd_impl(states0, enc, gs)

    def chain_fwd(states0, enc, gs):
        out = fwd_impl(states0, enc, gs)
        return out, (out, enc, gs)

    def chain_bwd(res, ct):
        out, enc, gs = res
        tab = None if ring_kind == "none" else jnp.asarray(tab_np)
        idx_xs = (None if (ring_kind == "none" or uniform)
                  else jnp.asarray(idx_np)[::-1])
        if encode_kind == "ry":
            d_enc0 = tuple(jnp.zeros_like(e) for e in enc)
        else:
            d_enc0 = jnp.zeros_like(enc)

        def body(carry, xs):
            gs_l, idx_l = xs
            s, c, d_enc = carry
            dgs_l = tuple(jnp.zeros_like(g) for g in gs_l)
            for li in range(k - 1, -1, -1):
                if ring_kind != "none":
                    row = _row(tab, idx_l, li, 1)  # undo == transpose slot
                    s = _apply_ring(s, row, ring_kind)
                    c = _apply_ring(c, row, ring_kind)
                for gi in range(len(sizes) - 1, -1, -1):
                    off, sz = offs[gi], sizes[gi]
                    g = gs_l[gi][li]
                    s = _apply_group(s, _adjT(g), off, sz, wires)
                    dgs_l = tuple(
                        d.at[li].set(_group_dg(c, s, off, sz, wires, False))
                        if j == gi else d for j, d in enumerate(dgs_l))
                    c = _apply_group(c, _swapT(g), off, sz, wires)
            # reverse through the encoding
            if encode_kind == "rz":
                s = s * jnp.conj(enc)  # unit phases: conj == inverse
                d_enc = d_enc + c * s
                c = c * enc
            elif encode_kind == "ry":
                for gi in range(len(sizes) - 1, -1, -1):
                    off, sz = offs[gi], sizes[gi]
                    e = enc[gi]
                    s = _apply_group(s, _adjT(e), off, sz, wires)
                    d_enc = tuple(
                        d + _group_dg(c, s, off, sz, wires, True)
                        if j == gi else d for j, d in enumerate(d_enc))
                    c = _apply_group(c, _swapT(e), off, sz, wires)
            return (s, c, d_enc), dgs_l

        (s0, c0, d_enc), dgs = jax.lax.scan(
            body, (out, ct, d_enc0), (tuple(g[::-1] for g in gs), idx_xs))
        return c0, d_enc, tuple(d[::-1] for d in dgs)

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


@functools.lru_cache(maxsize=None)
def _make_wide_chain_pallas(L: int, k: int, wires: int,
                            variant: str = "scan"):
    """Fused-kernel twin of _make_wide_chain (rz / cz / zero-init only),
    operating on packed 2**20 superstates (see _reupload_wide_kernel).

    ``variant`` picks the kernel organization (config.wide_kernel_variant):
    "scan" = per-sublayer programs reused via lax.scan (bounded Mosaic
    compile — the production route); "monolith" = the whole chain in one
    kernel (minimum HBM, depth-scaling compile cost — experimental).

    Returns ``chain(enc_packed, gs_padded) -> states_packed``. The
    complex<->plane conversions below live INSIDE the custom-VJP fwd/bwd,
    so they are never themselves differentiated — the hand-written
    backward carries the exact cotangent conventions of the XLA chain
    (tests/test_wide_kernel.py pins values + grads for both variants)."""
    from . import pallas_wide_kernel as wk

    fwd_planes = wk.wide_fwd_scan if variant == "scan" else wk.wide_fwd_planes
    bwd_planes = wk.wide_bwd_scan if variant == "scan" else wk.wide_bwd_planes

    # evaluated at trace time, NOT at factory-cache-fill time: the chain is
    # lru_cached on (L, k, wires, variant) only, and tests/drivers can flip
    # the default backend within a process (e.g. forcing cpu) — a captured
    # flag would silently reuse the stale interpret decision
    def _interpret() -> bool:
        return jax.default_backend() != "tpu"

    def _check_monolith_depth():
        # Measured on the v5e (tools/bench_wide_kernel_bisect.py,
        # results/wide_kernel_bisect.json): the monolithic chain kernel's
        # Mosaic compile is pathological — the L=1 forward alone took
        # 556 s through the axon remote compiler, and even the L=1
        # BACKWARD OOM-killed the compile helper after 1482 s (SIGKILL).
        # Fail fast instead of walking a user into a ten-minute-to-OOM
        # compile; interpret mode (CPU parity tests) has no Mosaic compile
        # and stays exact at any depth.
        if variant == "monolith" and not _interpret() and L > 1:
            raise ValueError(
                f"wide_kernel_variant='monolith' at L={L} (k={k}, "
                f"wires={wires}): the monolithic kernel's Mosaic compile "
                f"is infeasible beyond L=1 on TPU (556 s for the L=1 "
                f"forward; even the L=1 backward OOM-kills the compiler "
                f"after ~25 min — results/wide_kernel_bisect.json). Use "
                f"the 'scan' variant (set_wide_kernel_variant('scan')), "
                f"which compiles one sublayer-sized program regardless of "
                f"depth — though note the on-chip A/B rejected BOTH "
                f"variants for production (config.wide_kernel_mode).")

    def fwd_impl(enc, gs):
        _check_monolith_depth()
        out = fwd_planes(wk.to_planes(enc), wk.gs_to_planes(gs),
                         L, k, wires, interpret=_interpret())
        return wk.from_planes(out, dtype=enc.dtype)

    @jax.custom_vjp
    def chain(enc, gs):
        return fwd_impl(enc, gs)

    def chain_fwd(enc, gs):
        out = fwd_impl(enc, gs)
        return out, (out, enc, gs)

    def chain_bwd(res, ct):
        out, enc, gs = res
        denc_p, dgs_p = bwd_planes(
            wk.to_planes(out), wk.to_planes(ct), wk.to_planes(enc),
            wk.gs_to_planes(gs), L, k, wires, interpret=_interpret())
        return (wk.from_planes(denc_p, dtype=enc.dtype),
                wk.dgs_from_planes(dgs_p, L, k, dtype=gs[0].dtype))

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


def _reupload_wide_kernel(x_enc, block_weights, cdtype):
    """Fused-kernel route for the rz/CZ re-uploading chain: pack
    ``2**(20 - w)`` samples per 2**20 superstate (batch bits lead, gate
    list extended with identities on them — padded groups are
    ``I (x) G`` blocks that never mix samples), run the VMEM-resident
    chain, unpack. Padded tail samples carry unit phases forward and
    zero cotangents backward, so dG/d_enc stay exact; the padded-group
    assembly is plain autodiff (identity slots are constants), pulling
    dG back to the real per-wire rotation angles."""
    from .pallas_wide_kernel import SIZES, TOTAL_BITS
    from .statevector import rz_phases

    L, k, wires, _ = block_weights.shape
    batch = x_enc.shape[0]
    pack = 2 ** (TOTAL_BITS - wires)
    bp = -(-batch // pack)
    pad_n = bp * pack - batch
    enc = rz_phases(x_enc, wires).astype(cdtype)
    if pad_n:
        enc = jnp.concatenate(
            [enc, jnp.ones((pad_n, enc.shape[1]), enc.dtype)])
    enc_packed = enc.reshape(bp, 2**TOTAL_BITS)
    flat = block_weights.reshape(L * k, wires, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1],
                      flat[..., 2]).astype(cdtype)
    if TOTAL_BITS > wires:
        eye = jnp.broadcast_to(jnp.eye(2, dtype=cdtype),
                               (L * k, TOTAL_BITS - wires, 2, 2))
        mats = jnp.concatenate([eye, mats], axis=1)
    gs = tuple(g.reshape(L, k, *g.shape[1:])
               for g in group_gates(mats, SIZES))
    chain = _make_wide_chain_pallas(L, k, wires,
                                    _config.wide_kernel_variant())
    states = chain(enc_packed, gs)
    return states.reshape(bp * pack, 2**wires)[:batch]


def _use_wide_kernel(wires: int, encode: str, imprimitive: str,
                     cdtype) -> bool:
    """Fused-kernel routing (config.wide_kernel_mode): "on" forces it
    anywhere eligible (interpret-mode off-TPU — CPU parity tests), "auto"
    engages on TPU only, "off" keeps the XLA grouped chain. Eligible =
    rz encode + CZ ring + complex64 + wires in [13, 20] (13 = beyond the
    <=12-wire gate kernels; 20 = the superstate width — the backward
    holds ~8 plane-sized buffers of 2**20 * 4 B each against the v5e's
    128 MB VMEM)."""
    from .pallas_wide_kernel import MIN_WIRES, TOTAL_BITS

    mode = _config.wide_kernel_mode()
    if mode == "off":
        return False
    eligible = (encode in ("rz", "rz_halfpi") and imprimitive == "cz"
                and cdtype == jnp.complex64
                and MIN_WIRES <= wires <= TOTAL_BITS)
    if not eligible:
        return False
    return mode == "on" or jax.default_backend() == "tpu"


def max_group_bits() -> int:
    """Group width cap: 7 -> 128 x 128 group matrices, exactly one MXU
    tile edge (tools/bench_wide_micro.py: larger groups double FLOPs for
    the same wall, smaller ones pad)."""
    return 7


def reupload_chain_wide(x_enc, block_weights, *, encode: str = "rz",
                        imprimitive: str = "cz", cdtype=jnp.complex64):
    """Grouped-contraction re-uploading block: drop-in for
    sim.adjoint.reupload_chain_adjoint on wide circuits.

    x_enc: (B, wires) encoding angles (halfpi/rot-angle transforms
    already applied by the engine); block_weights: (L, k, wires, 3).
    Ring range cycle restarts every spectrum layer (the reference
    instantiates a fresh SEL template per layer, nn/qdense.py:1302-1305).
    Returns final states (B, 2**w); gradients flow to x_enc and weights.
    """
    from .statevector import ry_gates, rz_phases, zero_state

    L, k, wires, _ = block_weights.shape
    batch = x_enc.shape[0]
    if _use_wide_kernel(wires, encode, imprimitive, cdtype):
        return _reupload_wide_kernel(x_enc, block_weights, cdtype)
    sizes = group_sizes(wires, max_group_bits())
    flat = block_weights.reshape(L * k, wires, 3)
    mats = rot_matrix(flat[..., 0], flat[..., 1],
                      flat[..., 2]).astype(cdtype)
    gs = tuple(g.reshape(L, k, *g.shape[1:])
               for g in group_gates(mats, sizes))
    states0 = zero_state(batch, wires, dtype=cdtype)
    if encode in ("rz", "rz_halfpi"):
        enc = rz_phases(x_enc, wires).astype(cdtype)
        kind = "rz"
    elif encode == "ry":
        enc = group_gates(ry_gates(x_enc, dtype=cdtype), sizes)
        kind = "ry"
    else:
        raise ValueError(f"unknown encode {encode!r}")
    chain = _make_wide_chain(L, k, wires, imprimitive, kind,
                             False, sizes)
    return chain(states0, enc, gs)


def sel_chain_wide(states, weights, imprimitive: str = "cnot"):
    """Grouped-contraction SEL chain: drop-in for
    sim.adjoint.sel_chain_adjoint (Qdense/QNN wide circuits).

    states: (B, 2**w); weights: (depth, wires, 3). Range cycle spans the
    full depth (one deep template, sel_apply_gates semantics). Gradients
    flow to both states and weights.
    """
    depth, wires, _ = weights.shape
    sizes = group_sizes(wires, max_group_bits())
    mats = rot_matrix(weights[..., 0], weights[..., 1],
                      weights[..., 2]).astype(states.dtype)
    gs = tuple(g[:, None] for g in group_gates(mats, sizes))  # (depth,1,..)
    chain = _make_wide_chain(depth, 1, wires, imprimitive, "none",
                             True, sizes)
    enc = jnp.zeros((0,), states.dtype)  # "none" placeholder
    return chain(states, enc, gs)
