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
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .gates import rot_matrix
from .sel import sel_ranges
from .statevector import z_sign_table


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

        for l in range(layers):
            mats = rot_matrix(weights[l, :, 0], weights[l, :, 1],
                              weights[l, :, 2]).astype(local.dtype)
            for j in range(wires):
                local = apply_1q_any(local, mats[j], j)
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
