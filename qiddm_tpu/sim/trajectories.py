"""Monte-Carlo trajectory (Kraus-unraveling) noise backend.

The density-matrix backend simulates channels exactly but costs O(4^w)
memory/compute per sample (``density.MAX_DM_WIRES = 12`` caps it). This
module simulates the SAME per-wire channels on statevectors by stochastic
unraveling: each trajectory samples one Kraus branch per (sample,
application point, wire) and the readout is averaged over ``n_traj``
trajectories — O(n_traj · 2^w) work that rides the statevector engine's
batched paths, so noisy circuits scale to every wire count the clean
engine reaches. The reference has no such mode at all (its noise sweeps
run on PennyLane ``default.mixed``, reference src/mnist_noise.py:214-230,
and inherit its density-matrix ceiling).

Unravelings per channel kind (conventions: ``channels.py``):

* ``phase_damping(g)`` — EXACT random-unitary (Pauli) form: the channel
  equals ``rho -> (1-q) rho + q Z rho Z`` with ``q = (1 - sqrt(1-g))/2``
  (both leave populations fixed and scale coherences by ``sqrt(1-g)``),
  so a trajectory applies Z with probability q. Norm-preserving, no
  renormalization.
* ``depolarizing(p)`` — EXACT Pauli mixture: I/X/Y/Z with probabilities
  ``(1-p, p/3, p/3, p/3)``.
* ``amplitude_damping(g)`` — not a random-unitary channel: norm-weighted
  Kraus sampling. ``K1 = sqrt(g)|0><1|`` fires with probability
  ``p1 = g * P(wire = 1)`` (``K1^+ K1 = g |1><1|``), else
  ``K0 = diag(1, sqrt(1-g))``; the chosen branch is divided by
  ``sqrt(p_branch)`` so the state stays normalized.

Unitary kinds (``phase_shift``, ``rot_angle``) never reach this module —
the engine keeps them on the clean statevector path (they commute with
probs/Z readouts or perturb only encode angles).

TPU shape strategy: trajectories are FLATTENED into the batch axis
(``(n_traj * batch, 2^w)`` states), not vmapped — the SEL layer unitaries
are shared across trajectories, so the entangler stays one big MXU matmul
while only the channel sampling is per-(trajectory, sample) elementwise
work. Wide circuits (> 10 wires) switch to the gate-level SEL route like
the engine's clean path.

Statistics: readouts are means of per-trajectory probs/Z-expectations;
the estimator is unbiased with per-entry std ~ 1/sqrt(n_traj)
(tests/test_trajectories.py pins convergence against the dm backend).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as _config
from .gates import I2, X, Y, Z
from .sel import sel_apply_gates, sel_layer_unitaries
from .statevector import (
    amplitude_embed,
    apply_1q,
    apply_ry_all,
    apply_unitary,
    bit_table,
    expval_z,
    probs,
    ry_product_state,
    rz_phases,
    zero_state,
)

_PAULI_KINDS = ("phase_damping", "depolarizing")


def _pauli_mixture(kind: str, strength):
    """(probabilities (m,), unitaries (m, 2, 2)) for random-unitary kinds.

    Probabilities are smooth in ``strength`` (traced strengths sweep in
    one program, like the dm closed forms)."""
    if kind == "phase_damping":
        q = 0.5 * (1.0 - jnp.sqrt(1.0 - strength))
        p = jnp.stack([1.0 - q, q])
        mats = np.stack([I2, Z])
    elif kind == "depolarizing":
        s = strength / 3.0
        p = jnp.stack([1.0 - strength, s, s, s])
        mats = np.stack([I2, X, Y, Z])
    else:
        raise ValueError(f"{kind!r} has no random-unitary unraveling")
    return p, mats


def wire_one_prob(states, wire: int, precision=None):
    """P(wire = 1) per state: (batch,) real."""
    wires = int(math.log2(states.shape[-1]))
    bits = jnp.asarray(bit_table(wires)[:, wire], jnp.real(states).dtype)
    return jnp.matmul(probs(states), bits,
                      precision=precision or _config.matmul_precision())


def apply_channel_trajectory(states, kind: str, strength, key):
    """One stochastic realization of the per-wire channel on ALL wires.

    states: (batch, 2^w) complex; returns same shape, norm preserved.
    Branch indices are sampled independently per (sample, wire).
    """
    wires = int(math.log2(states.shape[-1]))
    b = states.shape[0]
    cdtype = states.dtype
    if kind in _PAULI_KINDS:
        p, mats = _pauli_mixture(kind, strength)
        logits = jnp.log(jnp.maximum(p, 1e-30))
        idx = jax.random.categorical(key, logits, shape=(wires, b))
        if kind == "phase_damping":
            # Both branches (I, Z) are diagonal, so the whole sampled
            # Pauli string collapses to ONE per-sample sign plane:
            # sign[b, i] = (-1)^{popcount(bits_i AND zdraws_b)} — a single
            # fused elementwise pass instead of ``wires`` per-wire gate
            # applications (each a full-state HBM pass). Draw layout and
            # key use are IDENTICAL to the per-wire loop (same categorical
            # call), and the arithmetic is exact (+-1 products), so this
            # equals the gate loop bit for bit — pinned by
            # tests/test_trajectories.py::test_phase_damping_fused_pass.
            bits = jnp.asarray(bit_table(wires), jnp.float32)  # (d, w)
            zcount = jnp.matmul(idx.T.astype(jnp.float32), bits.T,
                                precision=_config.matmul_precision())
            sign = 1.0 - 2.0 * jnp.mod(zcount, 2.0)           # (b, d)
            return states * sign.astype(cdtype)
        mats = jnp.asarray(mats, cdtype)
        for j in range(wires):
            states = apply_1q(states, mats[idx[j]], j, wires)
        return states
    if kind == "amplitude_damping":
        u = jax.random.uniform(key, (wires, b))
        # lower bound 8: below it the per-wire XLA loop is already cheap
        # and the kernel's (2**w, tile) planes would have d < 8 sublanes —
        # sub-tile Mosaic layouts no hardware test exercises
        if wires >= 8 and _kernel_route(wires, cdtype, states, u, strength):
            return _amp_damp_fused(states, u, strength, 128, False)
        return _amp_damp_xla(states, u, strength)
    raise ValueError(f"no trajectory unraveling for channel {kind!r}")


def _amp_damp_xla(states, u, strength, p1_precision=None):
    """Sequential norm-weighted amplitude-damping branch sampling, pure
    XLA: p1 for wire j must see the state after wires 0..j-1, so the loop
    cannot be parallelized across wires. ``u``: (wires, batch) presampled
    uniforms (shared with the fused kernel route so both draw identically
    from one key). Also the semantic twin the fused kernel's backward
    re-runs under jax.vjp (:func:`_amp_damp_fused`) — that replay passes
    ``p1_precision="highest"`` so its branch picks (u < p1) match the
    kernel's direct f32 plane sums even if the user lowered the global
    matmul precision (a ~1e-3 p1 drift would make the backward follow a
    DIFFERENT trajectory realization than the forward took)."""
    from . import channels as ch

    wires = int(math.log2(states.shape[-1]))
    cdtype = states.dtype
    g = strength
    k0, k1 = (jnp.asarray(k, cdtype)
              for k in ch.amplitude_damping(g))
    for j in range(wires):
        p1 = g * wire_one_prob(states, j, p1_precision)    # (b,)
        pick1 = u[j] < p1
        # renormalize inside the branch gate: K_i / sqrt(p_i)
        inv0 = jax.lax.rsqrt(jnp.maximum(1.0 - p1, 1e-30))
        inv1 = jax.lax.rsqrt(jnp.maximum(p1, 1e-30))
        scale = jnp.where(pick1, inv1, inv0).astype(cdtype)
        gate = jnp.where(pick1[:, None, None], k1[None], k0[None])
        states = apply_1q(states, gate * scale[:, None, None], j, wires)
    return states


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _amp_damp_fused(states, u, strength, tile, interpret):
    """Fused-kernel amplitude-damping channel pass (TPU route): the whole
    sequential per-wire marginal+branch loop runs with each (2**w, tile)
    state chunk VMEM-resident (pallas_gate_kernel._amp_damp_kernel) — one
    HBM read+write per chunk instead of ~2 full-state passes per wire.

    Differentiation: the backward re-runs the XLA twin under jax.vjp with
    the SAME uniforms (branch choices are data-dependent, so fwd/bwd
    could disagree only on measure-zero u == p1 ulp edges). Trajectory
    TRAINING therefore pays the old XLA cost on the backward only;
    sampling (the hot path) never differentiates."""
    B, d = states.shape
    w = int(math.log2(d))
    sr = jnp.real(states).astype(jnp.float32).T            # (d, B)
    si = jnp.imag(states).astype(jnp.float32).T
    ga = jnp.reshape(jnp.asarray(strength, jnp.float32), (1,))
    uf = u.astype(jnp.float32)                             # (w, B)
    from .pallas_gate_kernel import amp_damp_call_planes

    if B <= tile:
        outr, outi = amp_damp_call_planes(sr, si, uf, ga, w,
                                          interpret=interpret)
    else:
        n_chunks = -(-B // tile)
        pad = n_chunks * tile - B
        if pad:
            sr = jnp.pad(sr, ((0, 0), (0, pad)))
            si = jnp.pad(si, ((0, 0), (0, pad)))
            # u=1 on padded lanes: p1=0 there, branch 0, no NaNs
            uf = jnp.pad(uf, ((0, 0), (0, pad)), constant_values=1.0)
        srn = jnp.moveaxis(sr.reshape(d, n_chunks, tile), 1, 0)
        sin = jnp.moveaxis(si.reshape(d, n_chunks, tile), 1, 0)
        un = jnp.moveaxis(uf.reshape(w, n_chunks, tile), 1, 0)
        outr, outi = jax.lax.map(
            lambda t: amp_damp_call_planes(t[0], t[1], t[2], ga, w,
                                           interpret=interpret),
            (srn, sin, un))
        outr = jnp.moveaxis(outr, 0, 1).reshape(d, n_chunks * tile)[:, :B]
        outi = jnp.moveaxis(outi, 0, 1).reshape(d, n_chunks * tile)[:, :B]
    return (outr + 1j * outi).T.astype(states.dtype)


def _amp_damp_fused_fwd(states, u, strength, tile, interpret):
    return (_amp_damp_fused(states, u, strength, tile, interpret),
            (states, u, strength))


def _amp_damp_fused_bwd(tile, interpret, res, ct):
    states, u, strength = res
    _, vjp = jax.vjp(
        lambda s, g: _amp_damp_xla(s, u, g, p1_precision="highest"),
        states, strength)
    ds, dg = vjp(ct.astype(states.dtype))
    return ds, jnp.zeros_like(u), dg


_amp_damp_fused.defvjp(_amp_damp_fused_fwd, _amp_damp_fused_bwd)


def _require_key(key):
    # the sharded route raises the same guidance (sharded.py); without
    # this, key=None dies deep inside jax.random.split with an opaque
    # TypeError
    if key is None:
        raise ValueError(
            "the trajectory backend needs a PRNG key: pass "
            "traj_key=jax.random.PRNGKey(...) alongside n_traj")


def _tile_traj(x, n_traj: int):
    return jnp.tile(x, (n_traj,) + (1,) * (x.ndim - 1))


def _mean_over_traj(out, n_traj: int):
    return out.reshape((n_traj, -1) + out.shape[1:]).mean(axis=0)


def _unitary_route(wires: int) -> bool:
    """Same crossover as the engine's strategy ladder (engine.py:446-447):
    per-layer unitaries while they fit/pay off, gate-level beyond the
    Pallas cap (and from 9 wires off-TPU, where the O(d^3) unitary
    assembly is scalar work)."""
    return (wires <= _config.pallas_max_wires()
            and (jax.default_backend() == "tpu" or wires < 9))


def _kernel_route(wires: int, cdtype, *tracers) -> bool:
    """Batch-tiled fused-kernel route for trajectory SEL chains: wires
    just above the unitary route (11-12 by default) on TPU, where the
    gate-level XLA chain is ~24 bandwidth-bound full-state HBM passes per
    spectrum layer but a ``(2**w, tile)`` chunk still fits in VMEM
    (pallas_gate_kernel.sel_chain_pallas_tiled). Measured on v5e at the
    bench shape (w=12, 100 traj x 10 images): see DESIGN.md. Outer-vmap
    guarded like every sibling kernel route (engine._batch_traced)."""
    from .engine import _batch_traced

    return (_config.use_pallas()
            and jax.default_backend() == "tpu"
            and cdtype == jnp.complex64
            and wires <= _config.traj_pallas_max_wires()
            and not _batch_traced(*tracers))


def _sel_chain(states, w, imprimitive: str, cdtype):
    """SEL application for the trajectory-expanded batch: shared per-layer
    unitaries (one MXU matmul per layer, amortized over all trajectories)
    on the narrow route, the batch-tiled fused kernel just above it
    (:func:`_kernel_route`), gate-level beyond (:func:`_unitary_route`)."""
    wires = w.shape[1]
    if _unitary_route(wires):
        lus = sel_layer_unitaries(w[None],
                                  imprimitive=imprimitive)[0].astype(cdtype)

        def body(s, u):
            return apply_unitary(s, u), None

        states, _ = jax.lax.scan(body, states, lus)
        return states
    if _kernel_route(wires, cdtype, states, w):
        from .gates import rot_matrix
        from .pallas_gate_kernel import sel_chain_pallas_tiled

        mats = rot_matrix(w[..., 0], w[..., 1], w[..., 2])
        return sel_chain_pallas_tiled(states, mats, wires,
                                      imprimitive=imprimitive).astype(cdtype)
    return sel_apply_gates(states, w, imprimitive=imprimitive)


def reupload_block_trajectories(x_enc, block_weights, *, key, n_traj: int,
                                noise, encode: str = "rz",
                                imprimitive: str = "cz",
                                readout: str = "probs", cdtype=None):
    """Trajectory estimate of the dm re-uploading block.

    Matches ``engine.reupload_block``'s density-matrix path in expectation:
    placement "encode" injects the channel after every re-upload
    (L x [encode -> channel -> SEL(k, CZ)], reference nn/qdense.py:1403-1421),
    placement "end" once after the whole block. x_enc must already carry
    any halfpi/rot-angle transforms (the engine applies them before
    routing).

    x_enc: (batch, wires); block_weights: (L, k, wires, 3); key: PRNGKey.
    Returns (batch, 2^w) probs or (batch, wires) Z-expectations.
    """
    _require_key(key)
    if cdtype is None:
        cdtype = _config.complex_dtype()
    L, k, wires, _ = block_weights.shape
    batch = x_enc.shape[0]
    xT = _tile_traj(x_enc, n_traj)
    states = zero_state(n_traj * batch, wires, dtype=cdtype)
    phases = rz_phases(xT, wires) if encode in ("rz", "rz_halfpi") else None
    keys = jax.random.split(key, L + 1)

    # One lax.scan over L with the per-layer SEL operand and channel key
    # as xs — O(1) traced-program size in depth, matching the engine's
    # clean gate-level path (engine.py:463-467). Narrow route: all L*k
    # layer unitaries batch-assembled up front (one sel_layer_unitaries
    # call, MXU work); wide route: per-layer weights ride the scan and
    # sel_apply_gates runs gate-level inside the body.
    if _unitary_route(wires):
        sel_xs = sel_layer_unitaries(
            block_weights, imprimitive=imprimitive).astype(cdtype)

        def apply_sel(s, u_l):  # u_l: (k, d, d)
            def kbody(s, u):
                return apply_unitary(s, u), None

            return jax.lax.scan(kbody, s, u_l)[0]
    elif _kernel_route(wires, cdtype, states, block_weights, x_enc):
        from .gates import rot_matrix
        from .pallas_gate_kernel import sel_chain_pallas_tiled

        sel_xs = block_weights

        def apply_sel(s, w_l):  # w_l: (k, wires, 3)
            # ring ranges restart per spectrum layer (engine.py), which is
            # exactly the kernel's own per-call cycle start
            mats = rot_matrix(w_l[..., 0], w_l[..., 1], w_l[..., 2])
            return sel_chain_pallas_tiled(
                s, mats, wires, imprimitive=imprimitive).astype(cdtype)
    else:
        sel_xs = block_weights

        def apply_sel(s, w_l):  # w_l: (k, wires, 3)
            return sel_apply_gates(s, w_l, imprimitive=imprimitive)

    def body(states, xs):
        sel_l, key_l = xs
        states = (states * phases if phases is not None
                  else apply_ry_all(states, xT))
        if noise.placement == "encode":
            states = apply_channel_trajectory(states, noise.kind,
                                              noise.strength, key_l)
        return apply_sel(states, sel_l), None

    states, _ = jax.lax.scan(body, states, (sel_xs, keys[:L]))
    if noise.placement == "end":
        states = apply_channel_trajectory(states, noise.kind,
                                          noise.strength, keys[L])
    out = probs(states) if readout == "probs" else expval_z(states)
    return _mean_over_traj(out, n_traj)


def qdense_circuit_trajectories(x, weights, *, key, n_traj: int, noise,
                                wires: int, pad_with: float = 0.1,
                                weight_map: str = "qw_tanh",
                                imprimitive: str = "cnot", cdtype=None):
    """Trajectory estimate of the qdense dm path: AmplitudeEmbedding ->
    SEL -> channel at END -> mean probs (reference nn/qdense.py:95-105)."""
    from .gates import WEIGHT_MAPS

    _require_key(key)
    if cdtype is None:
        cdtype = _config.complex_dtype()
    w = WEIGHT_MAPS[weight_map](weights)
    states = amplitude_embed(_tile_traj(x, n_traj), wires,
                             pad_with=pad_with, dtype=cdtype)
    states = _sel_chain(states, w, imprimitive, cdtype)
    states = apply_channel_trajectory(states, noise.kind, noise.strength,
                                      key)
    return _mean_over_traj(probs(states), n_traj)


def qnn_circuit_trajectories(x, weights, *, key, n_traj: int, noise,
                             encode: str = "rz", imprimitive: str = "cz",
                             weight_map: str = "none",
                             readout: str = "expvalz", cdtype=None):
    """Trajectory estimate of the qnn dm path: single encode -> (channel
    if placement 'encode') -> SEL -> (channel if 'end') -> mean readout
    (reference nn/qdense.py:249-265 / :162-183)."""
    from .gates import WEIGHT_MAPS

    _require_key(key)
    if cdtype is None:
        cdtype = _config.complex_dtype()
    wires = x.shape[-1]
    w = WEIGHT_MAPS[weight_map](weights)
    xT = _tile_traj(x, n_traj)
    if encode == "ry":
        states = ry_product_state(xT, wires, dtype=cdtype)
    else:
        states = zero_state(xT.shape[0], wires, dtype=cdtype) * rz_phases(
            xT, wires)
    k_enc, k_end = jax.random.split(key)
    if noise.placement == "encode":
        states = apply_channel_trajectory(states, noise.kind,
                                          noise.strength, k_enc)
    states = _sel_chain(states, w, imprimitive, cdtype)
    if noise.placement == "end":
        states = apply_channel_trajectory(states, noise.kind,
                                          noise.strength, k_end)
    out = probs(states) if readout == "probs" else expval_z(states)
    return _mean_over_traj(out, n_traj)
