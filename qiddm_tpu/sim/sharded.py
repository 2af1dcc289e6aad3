"""Distributed statevector simulation over a device mesh.

The reference caps out at 10 qubits (a 2^10 statevector on one host).
Nothing in its workload needs more — SURVEY §5.7 marks statevector sharding
as the future-work scaling axis — but a TPU-native framework should scale
past single-chip memory, so this module implements it: the state's
MOST-SIGNIFICANT wires index the device (the top ``log2(n_devices)`` bits of
the basis index select the shard), everything else stays local.

Communication pattern per gate:

* 1q gate on a LOCAL wire: embarrassingly parallel (no comm).
* 1q gate on a SHARDED wire: one pairwise ``ppermute`` exchange between the
  device pairs differing in that bit (the classic distributed-statevector
  butterfly), then a local axpy.
* CZ (any wires): diagonal — always local (signs from the global index).
* CNOT: control-sharded/target-local needs NO comm (a conditional local bit
  flip); target-sharded needs one masked pairwise exchange.
* measurement (probs -> marginals/expvals): local + ``psum``.

Everything runs inside one ``jax.shard_map`` region, so XLA overlaps the
ppermutes with local compute where possible. Gradients flow (ppermute is
differentiable).
"""

from __future__ import annotations

import math
import functools
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config as _config
from .gates import rot_matrix
from .sel import _batched_kron_chain, sel_ranges
from .statevector import z_sign_table
from .wide import _adjT, _swapT, group_sizes


def _local_group_layout(local_wires: int, grouped: bool):
    """Partition the LOCAL wires into Kronecker groups (sim/wide.py
    semantics, <=7 bits -> <=128x128 group matrices on the MXU tile
    edge). ``grouped=False`` degenerates to size-1 groups — exactly the
    per-wire einsum the path always did, so "off" is a true fallback."""
    if not local_wires:
        return (), ()
    sizes = group_sizes(local_wires) if grouped else (1,) * local_wires
    offs = []
    o = 0
    for s in sizes:
        offs.append(o)
        o += s
    return sizes, tuple(offs)


def _axis_info(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


class ShardedState:
    """A (2**wires,) statevector sharded over ``mesh[axis]``.

    Host-side handle; the array's leading dimension is the device axis.
    """

    def __init__(self, wires: int, mesh: Mesh, axis: str = "data"):
        self.wires = wires
        self.mesh = mesh
        self.axis = axis
        self.n_dev = _axis_info(mesh, axis)
        self.shard_bits = int(math.log2(self.n_dev))
        if 2**self.shard_bits != self.n_dev:
            raise ValueError("device-axis size must be a power of two")
        if self.shard_bits > wires:
            raise ValueError("more shard bits than wires")
        self.local_wires = wires - self.shard_bits


def zero_state_sharded(spec: ShardedState, dtype=jnp.complex64):
    dim_local = 2**spec.local_wires
    state = jnp.zeros((spec.n_dev, dim_local), dtype=dtype)
    state = state.at[0, 0].set(1.0)
    return jax.device_put(
        state, NamedSharding(spec.mesh, P(spec.axis)))


def _local_apply_1q(local, gate, wire_local: int, local_wires: int):
    left = 2**wire_local
    right = 2 ** (local_wires - wire_local - 1)
    st = local.reshape(left, 2, right)
    out = jnp.einsum("xy,lyr->lxr", gate, st)
    return out.reshape(-1)


def make_sel_program(spec: ShardedState, layers: int, imprimitive: str = "cz"):
    """Build a jittable f(state, weights) applying SEL over the mesh.

    weights: (layers, wires, 3). Returns (new_state, probs_marginal_fn).
    """
    wires, s_bits = spec.wires, spec.shard_bits
    local_wires = spec.local_wires
    n_dev, axis = spec.n_dev, spec.axis
    ranges = sel_ranges(layers, wires)
    l_sizes, l_offs = _local_group_layout(
        local_wires, _config.wide_mode() != "off")

    # static sign table for local CZ diagonals needs the global index:
    # global = dev_idx * 2**local_wires + local_idx

    def body(local, weights):
        # local: (local_dim,) on each device
        dev = jax.lax.axis_index(axis)

        def bit_of_dev(j):  # wire j < s_bits
            return (dev >> (s_bits - 1 - j)) & 1

        def global_bits(j):  # (local_dim,) bit of wire j for each local amp
            if j < s_bits:
                return jnp.broadcast_to(bit_of_dev(j), local.shape)
            pos = local_wires - 1 - (j - s_bits)
            idx = jax.lax.broadcasted_iota(jnp.int32, (local.shape[0], 1),
                                           0)[:, 0]
            return (idx >> pos) & 1

        def apply_1q_any(local, gate, j):
            if j >= s_bits:
                return _local_apply_1q(local, gate, j - s_bits, local_wires)
            # sharded wire: pairwise exchange
            bit = 1 << (s_bits - 1 - j)
            perm = [(i, i ^ bit) for i in range(n_dev)]
            other = jax.lax.ppermute(local, axis, perm)
            b = bit_of_dev(j)
            mine0 = gate[0, 0] * local + gate[0, 1] * other
            mine1 = gate[1, 0] * other + gate[1, 1] * local
            return jnp.where(b == 0, mine0, mine1)

        def apply_cnot(local, c, t):
            cbits = global_bits(c)
            if t >= s_bits:
                # target local: flip target bit where control is 1 — the
                # local permutation is a reshape-axis swap
                tl = t - s_bits
                left = 2**tl
                right = 2 ** (local_wires - tl - 1)
                st = local.reshape(left, 2, right)
                flipped = st[:, ::-1, :].reshape(-1)
                return jnp.where(cbits == 1, flipped, local)
            # target sharded: the partner (differs only in the target bit)
            # always shares each amplitude's control bit, so a masked
            # pairwise exchange suffices
            bit = 1 << (s_bits - 1 - t)
            perm = [(i, i ^ bit) for i in range(n_dev)]
            other = jax.lax.ppermute(local, axis, perm)
            return jnp.where(cbits == 1, other, local)

        def apply_cz(local, c, t):
            sign = 1.0 - 2.0 * (global_bits(c) * global_bits(t))
            return local * sign.astype(local.real.dtype)

        def apply_group_vec(local, g, o, s):
            # Kronecker group on LOCAL wires [o, o+s) — comm-free matmul
            # (sim/wide.py grouping; (local_dim,) unbatched state here)
            left = 2**o
            right = 2 ** (local_wires - o - s)
            out = jnp.einsum("xy,lyr->lxr", g,
                             local.reshape(left, 2**s, right),
                             precision=_config.matmul_precision())
            return out.reshape(-1)

        for l in range(layers):
            mats = rot_matrix(weights[l, :, 0], weights[l, :, 1],
                              weights[l, :, 2]).astype(local.dtype)
            for j in range(s_bits):
                local = apply_1q_any(local, mats[j], j)
            for gi, (o, s) in enumerate(zip(l_offs, l_sizes)):
                g = _batched_kron_chain(mats[s_bits + o:s_bits + o + s])
                local = apply_group_vec(local, g, o, s)
            if wires > 1:
                r = ranges[l]
                for j in range(wires):
                    t = (j + r) % wires
                    if imprimitive == "cz":
                        local = apply_cz(local, j, t)
                    else:
                        local = apply_cnot(local, j, t)
        return local

    fn = jax.shard_map(
        body, mesh=spec.mesh,
        in_specs=(P(spec.axis), P()), out_specs=P(spec.axis))
    return jax.jit(fn)


def make_reupload_program(spec: ShardedState, L: int, k: int, *,
                          imprimitive: str = "cz", encode: str = "rz",
                          readout: str = "expvalz", dtype=jnp.complex64,
                          noise_kind: str | None = None,
                          noise_placement: str = "encode",
                          adjoint: bool = False,
                          grouped: bool = True):
    """Batched re-uploading block over the mesh — the engine's
    ``reupload_block`` semantics (L x (per-wire encode -> SEL(k))) for
    statevectors too large for one chip.

    Returns a jittable ``f(x_enc (B, wires), weights (L, k, wires, 3)) ->``
    ``(B, wires)`` expvals (replicated) or ``(B, 2**wires)`` probs (sharded
    on the last axis). The batch is replicated; the state dimension shards
    over ``spec.axis``. RZ encoding is diagonal, hence comm-free; RY
    encoding (the QIDDM_PL_noise1 re-uploading variant, reference
    nn/qdense.py:597-617) and rotation gates on sharded wires cost one
    pairwise ``ppermute`` each.

    With ``noise_kind`` the program becomes ONE Monte-Carlo trajectory of
    the noisy block (sim/trajectories.py semantics; ``noise_placement``
    "encode" injects after every re-upload, "end" once after the block):
    signature ``f(x_enc, weights, key, strength)``. Branch sampling is
    key-replicated (every device draws the same branches, keeping the
    state globally coherent); the sampled branch gates are per-sample 1q
    applications (``apply_1q_batched`` — one ppermute on sharded wires);
    amplitude damping's norm weights need one extra ``psum`` marginal per
    (layer, wire). Trajectory averaging is the CALLER's axis (tile the
    batch, mean after) — this composes noise with wire counts neither the
    reference nor any density-matrix backend can reach.

    ``adjoint`` (clean path only) swaps plain autodiff for the O(1)-residual
    adjoint backward — see ``body_adjoint`` below. This is the default via
    the engine route (config.adjoint_mode != "off").
    """
    if encode not in ("rz", "rz_halfpi", "ry"):
        raise NotImplementedError(
            f"sharded reupload supports rz/rz_halfpi/ry encodings, "
            f"got {encode!r}")
    if noise_kind is not None and noise_kind not in (
            "phase_damping", "depolarizing", "amplitude_damping"):
        raise NotImplementedError(
            f"no trajectory unraveling for channel {noise_kind!r}")
    wires, s_bits = spec.wires, spec.shard_bits
    local_wires, n_dev, axis = spec.local_wires, spec.n_dev, spec.axis
    dim_local = 2**local_wires
    ranges = sel_ranges(k, wires)  # restart per spectrum layer (engine.py)
    # LOCAL wires apply as Kronecker-grouped contractions (sim/wide.py:
    # ceil(local/7) matmul passes instead of ``local_wires`` per-gate
    # passes over the shard); SHARDED wires keep the per-wire ppermute
    # butterfly — a group matrix cannot span the device bit.
    l_sizes, l_offs = _local_group_layout(local_wires, grouped)

    # (dim_local, local_wires) sign table for the local wires
    signs_local = jnp.asarray(z_sign_table(local_wires), jnp.float32)

    # ---- shared per-device ops ---------------------------------------------
    # One definition of the forward gate semantics, used by BOTH program
    # bodies (plain/noise and adjoint) so they cannot drift. axis_index is
    # taken at USE time, never closed over: the adjoint custom-VJP fwd/bwd
    # may not capture tracers from the surrounding shard_map trace ("no
    # constant handler" at jaxpr-ing time), and a fresh axis_index inside
    # their own traces is free. Contractions pin the configured matmul
    # precision (config.matmul_precision) like every other simulator path.

    def bit_of_dev(j):
        dev = jax.lax.axis_index(axis)
        return (dev >> (s_bits - 1 - j)) & 1

    def global_bits(j):  # (dim_local,) or scalar broadcastable
        if j < s_bits:
            return bit_of_dev(j)
        pos = local_wires - 1 - (j - s_bits)
        idx = jax.lax.broadcasted_iota(jnp.int32, (dim_local,), 0)
        return (idx >> pos) & 1

    def pair_swap(arr, j):  # partner exchange across sharded wire j's bit
        bit = 1 << (s_bits - 1 - j)
        perm = [(i, i ^ bit) for i in range(n_dev)]
        return jax.lax.ppermute(arr, axis, perm)

    def shaped(arr, j):  # (B, left, 2, right) view of LOCAL wire j
        tl = j - s_bits
        left = 2**tl
        right = 2 ** (local_wires - tl - 1)
        return arr.reshape(arr.shape[0], left, 2, right)

    def apply_1q_any(local, gate, j):
        """Shared (2, 2) single-qubit gate on wire j."""
        if j >= s_bits:
            out = jnp.einsum("xy,blyr->blxr", gate, shaped(local, j),
                             precision=_config.matmul_precision())
            return out.reshape(local.shape[0], -1)
        other = pair_swap(local, j)
        b = bit_of_dev(j)
        mine0 = gate[0, 0] * local + gate[0, 1] * other
        mine1 = gate[1, 0] * other + gate[1, 1] * local
        return jnp.where(b == 0, mine0, mine1)

    def apply_1q_batched(local, gates, j):
        """Per-SAMPLE (B, 2, 2) single-qubit gates on wire j."""
        if j >= s_bits:
            out = jnp.einsum("bxy,blyr->blxr", gates, shaped(local, j),
                             precision=_config.matmul_precision())
            return out.reshape(local.shape[0], -1)
        other = pair_swap(local, j)
        b = bit_of_dev(j)
        mine0 = gates[:, 0, 0, None] * local + gates[:, 0, 1, None] * other
        mine1 = gates[:, 1, 0, None] * other + gates[:, 1, 1, None] * local
        return jnp.where(b == 0, mine0, mine1)

    def shaped_block(arr, o, s):
        """(B, left, 2**s, right) view of the LOCAL wire block [o, o+s)
        (o in local-wire indexing; local wire 0 = shard-adjacent MSB)."""
        left = 2**o
        right = 2 ** (local_wires - o - s)
        return arr.reshape(arr.shape[0], left, 2**s, right)

    def apply_group(local, g, o, s):
        """Contract a Kronecker group matrix against local wires [o, o+s).
        g: (2**s, 2**s) shared or (B, 2**s, 2**s) per-sample. Comm-free —
        groups never span the device bit."""
        spec_str = "xy,blyr->blxr" if g.ndim == 2 else "bxy,blyr->blxr"
        out = jnp.einsum(spec_str, g, shaped_block(local, o, s),
                         precision=_config.matmul_precision())
        return out.reshape(local.shape[0], -1)

    def local_groups_of(mats_local):
        """Kronecker-compose per-LOCAL-wire gates (..., local_wires, 2, 2)
        into the group layout: tuple of (..., 2**s, 2**s)."""
        return tuple(
            _batched_kron_chain(mats_local[..., o:o + s, :, :])
            for o, s in zip(l_offs, l_sizes))

    def apply_cz(local, c, t):
        sign = 1.0 - 2.0 * (global_bits(c) * global_bits(t))
        return local * sign.astype(local.real.dtype)

    def apply_cnot(local, c, t):
        cbits = jnp.broadcast_to(global_bits(c), (dim_local,))
        if t >= s_bits:
            st = shaped(local, t)
            flipped = st[:, :, ::-1, :].reshape(local.shape[0], -1)
            return jnp.where(cbits[None, :] == 1, flipped, local)
        other = pair_swap(local, t)
        return jnp.where(cbits[None, :] == 1, other, local)

    def sel_ring(local, kk, reverse: bool = False):
        """The SEL imprimitive ring for sublayer kk. CZ gates commute
        (diagonal, self-inverse) so direction is immaterial; the CNOT ring
        is SEQUENTIAL — undo and cotangent transpose both walk it in
        reverse gate order (each CNOT is a self-inverse permutation)."""
        if wires == 1:
            return local
        r = ranges[kk]
        order = range(wires - 1, -1, -1) if reverse else range(wires)
        for j in order:
            t = (j + r) % wires
            if imprimitive == "cz":
                local = apply_cz(local, j, t)
            else:
                local = apply_cnot(local, j, t)
        return local

    def rz_phase_plane(x, cplx):
        """exp(i * angle) as a per-device (B, dim_local) plane. Angle is
        -0.5 * sum_j sign_j(i) * x_j (statevector.rz_phases convention):
        device bits give a per-(B,) scalar, local bits a matmul against the
        sign table. Accumulated in the state's real precision so the x64
        parity mode stays exact on the sharded path too."""
        rdt = jnp.float64 if cplx == jnp.complex128 else jnp.float32
        ang = jnp.zeros((x.shape[0],), rdt)
        for j in range(s_bits):
            sign = (1.0 - 2.0 * bit_of_dev(j)).astype(rdt)
            ang = ang - 0.5 * sign * x[:, j].astype(rdt)
        ang_local = -0.5 * jnp.matmul(x[:, s_bits:].astype(rdt),
                                      signs_local.T.astype(rdt),
                                      precision=_config.matmul_precision())
        total = ang[:, None] + ang_local  # (B, dim_local)
        return jnp.exp(1j * total.astype(cplx))

    def init_state(B, cplx):
        # |0...0> lives in device 0's shard
        local = jnp.zeros((B, dim_local), cplx)
        return jnp.where(jax.lax.axis_index(axis) == 0,
                         local.at[:, 0].set(1.0), local)

    def measure(local):
        p = jnp.real(local) ** 2 + jnp.imag(local) ** 2
        if readout == "probs":
            return p
        out = []
        for j in range(wires):
            if j < s_bits:
                sign = (1.0 - 2.0 * bit_of_dev(j)).astype(p.dtype)
                out.append(sign * jnp.sum(p, axis=1))
            else:
                out.append(jnp.matmul(
                    p, signs_local[:, j - s_bits].astype(p.dtype),
                    precision=_config.matmul_precision()))
        return jax.lax.psum(jnp.stack(out, axis=1), axis)

    def scaled_x(x_enc):
        return (jnp.pi * 0.5) * x_enc if encode == "rz_halfpi" else x_enc

    def build_enc(x, cplx):
        """The encoding operand: for RY a (shard_gates (B, s_bits, 2, 2),
        local group matrices tuple of (B, 2**s, 2**s)) pair — REPLICATED
        (pure functions of the replicated x) — or the RZ phase plane
        (B, dim_local) — device-VARYING. Built outside the adjoint custom
        VJP so its pullback onto x runs under plain autodiff (including
        through the Kronecker group assembly)."""
        if encode == "ry":
            from .statevector import ry_gates

            g = ry_gates(x, dtype=cplx)  # (B, wires, 2, 2)
            return (g[:, :s_bits], local_groups_of(g[:, s_bits:]))
        return rz_phase_plane(x, cplx)

    def enc_fwd(local, enc):
        if encode == "ry":
            enc_shard, enc_groups = enc
            for j in range(s_bits):
                local = apply_1q_batched(local, enc_shard[:, j], j)
            for gi, (o, s) in enumerate(zip(l_offs, l_sizes)):
                local = apply_group(local, enc_groups[gi], o, s)
            return local
        return local * enc

    # ---- plain / noise-trajectory body --------------------------------------

    def body(x_enc, weights, key, strength):
        B = x_enc.shape[0]
        x = scaled_x(x_enc)
        enc = build_enc(x, dtype)

        def apply_channel(local, key_l):
            """One key-replicated trajectory step of the per-wire channel
            (sampling mirrors trajectories.apply_channel_trajectory so the
            dense and sharded paths draw identical branches per key)."""
            from .trajectories import _pauli_mixture

            if noise_kind in ("phase_damping", "depolarizing"):
                p, mats = _pauli_mixture(noise_kind, strength)
                logits = jnp.log(jnp.maximum(p, 1e-30))
                mats = jnp.asarray(mats, dtype)
                idx = jax.random.categorical(key_l, logits, shape=(wires, B))
                for j in range(wires):
                    local = apply_1q_batched(local, mats[idx[j]], j)
                return local
            # amplitude damping: norm-weighted Kraus branch per (sample,
            # wire); P(wire=1) is a local marginal + one psum
            from . import channels as ch

            g = strength
            u = jax.random.uniform(key_l, (wires, B))
            k0, k1 = (jnp.asarray(kk, dtype)
                      for kk in ch.amplitude_damping(g))
            for j in range(wires):
                pl_ = jnp.real(local) ** 2 + jnp.imag(local) ** 2
                if j < s_bits:
                    part = jnp.sum(pl_, axis=1) * global_bits(j).astype(
                        pl_.dtype)
                else:
                    part = jnp.matmul(pl_, global_bits(j).astype(pl_.dtype))
                p1 = g * jax.lax.psum(part, axis)
                pick1 = u[j] < p1
                inv0 = jax.lax.rsqrt(jnp.maximum(1.0 - p1, 1e-30))
                inv1 = jax.lax.rsqrt(jnp.maximum(p1, 1e-30))
                scale = jnp.where(pick1, inv1, inv0).astype(dtype)
                gate = jnp.where(pick1[:, None, None], k1[None], k0[None])
                local = apply_1q_batched(local,
                                         gate * scale[:, None, None], j)
            return local

        noise_keys = (jax.random.split(key, L + 1) if noise_kind is not None
                      else None)

        local = init_state(B, dtype)
        for l in range(L):
            local = enc_fwd(local, enc)
            if noise_kind is not None and noise_placement == "encode":
                local = apply_channel(local, noise_keys[l])
            for kk in range(k):
                mats = rot_matrix(weights[l, kk, :, 0], weights[l, kk, :, 1],
                                  weights[l, kk, :, 2]).astype(dtype)
                for j in range(s_bits):
                    local = apply_1q_any(local, mats[j], j)
                for (o, s), g in zip(zip(l_offs, l_sizes),
                                     local_groups_of(mats[s_bits:])):
                    local = apply_group(local, g, o, s)
                local = sel_ring(local, kk)
        if noise_kind is not None and noise_placement == "end":
            local = apply_channel(local, noise_keys[L])
        return measure(local)

    # ---- adjoint body --------------------------------------------------------

    def body_adjoint(x_enc, weights):
        """The clean chain with an ADJOINT-mode custom VJP (sim/adjoint.py
        semantics on the distributed state): the backward reconstructs the
        sharded statevector through inverse gates instead of letting
        autodiff store every intermediate — O(L*k*wires) saved
        (B, dim_local)-per-device states drop to O(1), which matters most
        exactly here (the mesh path exists for states too large for one
        chip). Communication in the backward: per sharded-wire gate, one
        ppermute to rebuild the input state (the partner's half of the
        input is then computable locally for the gate cotangent) and one
        to transpose the cotangent; CZ rings and RZ encodes stay
        comm-free. Gate cotangents are per-device partials completed by
        one psum per backward scan.

        Note: as a custom_vjp, this path supports reverse-mode only —
        jax.jvp/jacfwd through the mesh route needs
        config.set_adjoint_mode("off").
        """
        B = x_enc.shape[0]
        cplx = jnp.dtype(dtype)

        def g_bwd(s, c, g, j):
            """Reverse one shared 1q gate: reconstruct the input state
            (U^H), transpose the cotangent (U^T, unconjugated), emit this
            device's partial of dU = sum c_out (x) s_in."""
            prec = _config.matmul_precision()
            if j >= s_bits:
                s_in = jnp.einsum("yx,blyr->blxr", jnp.conj(g),
                                  shaped(s, j), precision=prec).reshape(B, -1)
                du = jnp.einsum("blxr,blyr->xy", shaped(c, j),
                                shaped(s_in, j), precision=prec)
                c_in = jnp.einsum("yx,blyr->blxr", g,
                                  shaped(c, j), precision=prec).reshape(B, -1)
                return s_in, c_in, du
            so = pair_swap(s, j)
            co = pair_swap(c, j)
            b0 = bit_of_dev(j) == 0
            gc = jnp.conj(g)
            # own half of s_in (this device's y == its shard bit) and the
            # PARTNER's half — both computable from (s, so) locally
            s_in = jnp.where(b0, gc[0, 0] * s + gc[1, 0] * so,
                             gc[0, 1] * so + gc[1, 1] * s)
            s_in_partner = jnp.where(b0, gc[0, 1] * s + gc[1, 1] * so,
                                     gc[0, 0] * so + gc[1, 0] * s)
            c_in = jnp.where(b0, g[0, 0] * c + g[1, 0] * co,
                             g[0, 1] * co + g[1, 1] * c)
            own = jnp.sum(c * s_in)
            cross = jnp.sum(c * s_in_partner)
            zero = jnp.zeros_like(own)
            du = jnp.stack([
                jnp.stack([jnp.where(b0, own, zero),
                           jnp.where(b0, cross, zero)]),
                jnp.stack([jnp.where(b0, zero, cross),
                           jnp.where(b0, zero, own)])])
            return s_in, c_in, du

        def g_bwd_batched(s, c, g, j):
            """Reverse one per-sample 1q gate; du is (B, 2, 2)."""
            prec = _config.matmul_precision()
            if j >= s_bits:
                s_in = jnp.einsum("byx,blyr->blxr", jnp.conj(g),
                                  shaped(s, j), precision=prec).reshape(B, -1)
                du = jnp.einsum("blxr,blyr->bxy", shaped(c, j),
                                shaped(s_in, j), precision=prec)
                c_in = jnp.einsum("byx,blyr->blxr", g,
                                  shaped(c, j), precision=prec).reshape(B, -1)
                return s_in, c_in, du
            so = pair_swap(s, j)
            co = pair_swap(c, j)
            b0 = bit_of_dev(j) == 0
            gc = jnp.conj(g)
            s_in = jnp.where(
                b0, gc[:, 0, 0, None] * s + gc[:, 1, 0, None] * so,
                gc[:, 0, 1, None] * so + gc[:, 1, 1, None] * s)
            s_in_partner = jnp.where(
                b0, gc[:, 0, 1, None] * s + gc[:, 1, 1, None] * so,
                gc[:, 0, 0, None] * so + gc[:, 1, 0, None] * s)
            c_in = jnp.where(
                b0, g[:, 0, 0, None] * c + g[:, 1, 0, None] * co,
                g[:, 0, 1, None] * co + g[:, 1, 1, None] * c)
            own = jnp.sum(c * s_in, axis=1)
            cross = jnp.sum(c * s_in_partner, axis=1)
            zero = jnp.zeros_like(own)
            du = jnp.stack([
                jnp.stack([jnp.where(b0, own, zero),
                           jnp.where(b0, cross, zero)], axis=-1),
                jnp.stack([jnp.where(b0, zero, cross),
                           jnp.where(b0, zero, own)], axis=-1)], axis=-2)
            return s_in, c_in, du

        def g_bwd_group(s, c, g, o, sz, batched: bool):
            """Reverse one local Kronecker group: reconstruct the input
            state (G^H), emit this device's partial of dG = sum c (x) s_in
            (JAX's unconjugated convention), transpose the cotangent
            (G^T). Comm-free — local wires only."""
            s_in = apply_group(s, _adjT(g), o, sz)
            spec_str = "blxr,blyr->bxy" if batched else "blxr,blyr->xy"
            dg = jnp.einsum(spec_str, shaped_block(c, o, sz),
                            shaped_block(s_in, o, sz),
                            precision=_config.matmul_precision())
            c_in = apply_group(c, _swapT(g), o, sz)
            return s_in, c_in, dg

        def enc_bwd(s, c, d_enc, enc):
            if encode == "ry":
                enc_shard, enc_groups = enc
                d_shard, d_groups = d_enc
                for gi in range(len(l_sizes) - 1, -1, -1):
                    o, sz = l_offs[gi], l_sizes[gi]
                    s, c, dg = g_bwd_group(s, c, enc_groups[gi], o, sz,
                                           True)
                    d_groups = tuple(d + dg if i == gi else d
                                     for i, d in enumerate(d_groups))
                for j in range(s_bits - 1, -1, -1):
                    s, c, du = g_bwd_batched(s, c, enc_shard[:, j], j)
                    d_shard = d_shard.at[:, j].add(du)
                return s, c, (d_shard, d_groups)
            s_in = s * jnp.conj(enc)  # unit phases: conj == inverse
            d_enc = d_enc + c * s_in
            return s_in, c * enc, d_enc

        x = scaled_x(x_enc)
        enc = build_enc(x, cplx)

        def chain_impl(local0, enc, mats_shard, groups):
            # mats_shard: (L, k, s_bits, 2, 2); groups: tuple over local
            # Kronecker groups of (L, k, 2**s, 2**s)
            def layer(local, xs):
                mats_l, groups_l = xs
                local = enc_fwd(local, enc)
                for kk in range(k):
                    for j in range(s_bits):
                        local = apply_1q_any(local, mats_l[kk, j], j)
                    for gi, (o, sz) in enumerate(zip(l_offs, l_sizes)):
                        local = apply_group(local, groups_l[gi][kk], o, sz)
                    local = sel_ring(local, kk)
                return local, None

            out, _ = jax.lax.scan(layer, local0, (mats_shard, groups))
            return out

        @jax.custom_vjp
        def chain(local0, enc, mats_shard, groups):
            return chain_impl(local0, enc, mats_shard, groups)

        def chain_fwd(local0, enc, mats_shard, groups):
            out = chain_impl(local0, enc, mats_shard, groups)
            return out, (out, enc, mats_shard, groups)

        def chain_bwd(res, ct):
            out, enc, mats_shard, groups = res
            d_enc0 = jax.tree.map(jnp.zeros_like, enc)
            if encode == "ry":
                # enc (ry_gates of the replicated x) is replicated, but the
                # accumulated cotangent is device-varying until the final
                # psum — cast the carry so the scan types line up
                d_enc0 = jax.tree.map(
                    lambda t: jax.lax.pcast(t, (axis,), to="varying"),
                    d_enc0)

            def layer(carry, xs):
                mats_l, groups_l = xs
                s, c, d_enc = carry
                dm_l = jnp.zeros_like(mats_l)
                dg_l = tuple(jnp.zeros_like(g) for g in groups_l)
                for kk in range(k - 1, -1, -1):
                    s = sel_ring(s, kk, reverse=True)
                    c = sel_ring(c, kk, reverse=True)
                    for gi in range(len(l_sizes) - 1, -1, -1):
                        o, sz = l_offs[gi], l_sizes[gi]
                        s, c, dg = g_bwd_group(s, c, groups_l[gi][kk],
                                               o, sz, False)
                        dg_l = tuple(d.at[kk].set(dg) if i == gi else d
                                     for i, d in enumerate(dg_l))
                    for j in range(s_bits - 1, -1, -1):
                        s, c, du = g_bwd(s, c, mats_l[kk, j], j)
                        dm_l = dm_l.at[kk, j].set(du)
                s, c, d_enc = enc_bwd(s, c, d_enc, enc)
                return (s, c, d_enc), (dm_l, dg_l)

            (s0, c0, d_enc), (dms, dgs) = jax.lax.scan(
                layer, (out, ct, d_enc0),
                (mats_shard[::-1], tuple(g[::-1] for g in groups)))
            # gate/group cotangents are per-device PARTIALS of a
            # contraction over the distributed state dimension — psum
            # completes them. It also satisfies shard_map's replication
            # checker: ``mats``/``groups`` (and the RY ``enc``) are built
            # from replicated inputs, so their cotangents must be provably
            # replicated; the RZ phase plane is device-varying and its
            # cotangent stays local.
            dms = jax.lax.psum(dms[::-1], axis)
            dgs = tuple(jax.lax.psum(d[::-1], axis) for d in dgs)
            if encode == "ry":
                d_enc = jax.tree.map(lambda t: jax.lax.psum(t, axis),
                                     d_enc)
            return c0, d_enc, dms, dgs

        chain.defvjp(chain_fwd, chain_bwd)

        flat = weights.reshape(L * k, wires, 3)
        mats = rot_matrix(flat[..., 0], flat[..., 1],
                          flat[..., 2]).astype(cplx)
        mats = mats.reshape(L, k, wires, 2, 2)
        # group assembly stays OUTSIDE the custom VJP (tiny tensors):
        # plain autodiff carries dG -> per-gate dU -> rotation angles
        local = chain(init_state(B, cplx), enc, mats[:, :, :s_bits],
                      local_groups_of(mats[:, :, s_bits:]))
        return measure(local)
    out_spec = P(None, axis) if readout == "probs" else P()
    if noise_kind is None:
        clean = body_adjoint if adjoint else (
            lambda x, w: body(x, w, None, None))
        fn = jax.shard_map(clean, mesh=spec.mesh, in_specs=(P(), P()),
                           out_specs=out_spec)
    else:
        fn = jax.shard_map(body, mesh=spec.mesh,
                           in_specs=(P(), P(), P(), P()),
                           out_specs=out_spec)
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _cached_reupload_program(wires, mesh, axis, L, k, imprimitive, encode,
                             readout, dtype, noise_kind=None,
                             noise_placement="encode", adjoint=False,
                             grouped=True):
    """Memoized program build: a fresh jax.jit closure per call would be a
    new cache key every time, retracing/recompiling the whole shard_map
    program on each eager invocation of the engine mesh route."""
    spec = ShardedState(wires, mesh, axis)
    return make_reupload_program(spec, L, k, imprimitive=imprimitive,
                                 encode=encode, readout=readout,
                                 dtype=jnp.dtype(dtype),
                                 noise_kind=noise_kind,
                                 noise_placement=noise_placement,
                                 adjoint=adjoint, grouped=grouped)


def reupload_block_sharded(x_enc, block_weights, mesh, *, axis: str = "data",
                           imprimitive: str = "cz", encode: str = "rz",
                           readout: str = "expvalz", dtype=jnp.complex64,
                           noise_kind=None, noise_strength=None,
                           traj_key=None, n_traj: int = 0,
                           noise_placement: str = "encode"):
    """One-call form of make_reupload_program for engine routing.

    With ``noise_kind`` + ``n_traj``: runs the Monte-Carlo trajectory
    estimate on the mesh — trajectories tile the (replicated) batch axis,
    the readout is averaged over them (sim/trajectories.py semantics,
    identical branch draws per key as the dense backend)."""
    L, k, wires, _ = block_weights.shape
    if noise_kind is not None and (n_traj <= 0 or traj_key is None):
        raise ValueError(
            "noise_kind on the sharded path needs n_traj > 0 and a "
            "traj_key (Monte-Carlo trajectory backend)")
    # the mesh path IS the wide regime by definition (it exists for states
    # too large for one chip), so adjoint-mode differentiation is the
    # default for the clean chain; "off" keeps plain autodiff for A/B
    adjoint = noise_kind is None and _config.adjoint_mode() != "off"
    # local-wire Kronecker grouping shares the wide_mode switch: "off"
    # restores the per-wire einsum path exactly (size-1 groups)
    grouped = _config.wide_mode() != "off"
    fn = _cached_reupload_program(wires, mesh, axis, int(L), int(k),
                                  imprimitive, encode, readout,
                                  jnp.dtype(dtype).name, noise_kind,
                                  noise_placement, adjoint, grouped)
    if noise_kind is None:
        return fn(x_enc, block_weights)
    b = x_enc.shape[0]
    xT = jnp.tile(x_enc, (n_traj, 1))
    out = fn(xT, block_weights, traj_key,
             jnp.asarray(noise_strength, jnp.float32))
    return out.reshape((n_traj, b) + out.shape[1:]).mean(axis=0)


def probs_sharded(spec: ShardedState, state):
    """Full probability vector, still sharded (2**wires,) -> host gathers
    only if asked."""
    def body(local):
        return jnp.real(local) ** 2 + jnp.imag(local) ** 2

    fn = jax.shard_map(body, mesh=spec.mesh, in_specs=P(spec.axis),
                       out_specs=P(spec.axis))
    return jax.jit(fn)(state)


def expval_z_sharded(spec: ShardedState, state):
    """<Z_j> for every wire via local partials + psum: (wires,)."""
    wires, s_bits, local_wires = spec.wires, spec.shard_bits, spec.local_wires

    def body(local):
        p = jnp.real(local) ** 2 + jnp.imag(local) ** 2
        dev = jax.lax.axis_index(spec.axis)
        out = []
        signs_local = jnp.asarray(z_sign_table(local_wires), p.dtype)
        for j in range(wires):
            if j < s_bits:
                b = (dev >> (s_bits - 1 - j)) & 1
                sign = (1.0 - 2.0 * b).astype(p.dtype)
                out.append(sign * jnp.sum(p))
            else:
                out.append(jnp.sum(p * signs_local[:, j - s_bits]))
        partial_ = jnp.stack(out)
        return jax.lax.psum(partial_, spec.axis)

    fn = jax.shard_map(body, mesh=spec.mesh, in_specs=P(spec.axis),
                       out_specs=P())
    return jax.jit(fn)(state)
