"""Quantum convolution: amplitude-embedded patch circuits as batched matmuls.

Reference: nn/qconv.py. ``_QConv2d_FAST`` unfolds k x k x Cin patches,
amplitude-embeds each (pad 0.5, normalize), applies SEL(qw_tanh(w)) and reads
probabilities back as output channels. Two faithfulness notes:

* The released FAST forward never invokes its circuit — the quantum path is
  dead and raw unfolded pixels are post-processed instead (reference
  nn/qconv.py:71-87; SURVEY §8.6). This module implements the *intended*
  semantics (the eval-time ``sample_qnode`` path, nn/qconv.py:92-126, which
  precomputes the SEL unitary and replays it — exactly our fast path, used
  for training too since unitary composition is differentiable).
  ``compat_dead_qnode=True`` reproduces the released (buggy) behavior.
* MEDIUM/SLOW chain per-in-channel Mottonen preparations on the SAME wires;
  on a simulator a mid-circuit state preparation is realized by direct state
  injection of the (normalized) target amplitudes, which discards the
  incoming state — semantically what their chained MottonenStatePreparation
  does to each channel's fresh re-encode. They share this module's math with
  per-channel weights summed into one unitary chain.
"""

from __future__ import annotations

import math
import warnings
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..sim.gates import qw_tanh
from ..sim.sel import sel_unitary
from ..sim.statevector import amplitude_embed, probs
from .initializers import qconv_uniform


class QConv2d(nn.Module):
    """Quantum 2-D convolution (the reference's ``QConv2d = _QConv2d_FAST``).

    Input/output NCHW. wires = max(ceil(log2(k*k*Cin)), ceil(log2(Cout)), 1).
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (1, 1)
    qdepth: int = 2
    compat_dead_qnode: bool = False

    @property
    def wires(self) -> int:
        kh, kw = self.kernel_size
        w_in = math.ceil(math.log2(kh * kw * self.in_channels))
        w_out = math.ceil(math.log2(self.out_channels))
        return max(w_in, w_out, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, c, h_in, w_in = x.shape
        assert c == self.in_channels, \
            f"Expected {self.in_channels} channels, got {c}"
        kh, kw = self.kernel_size
        ph, pw = self.padding
        h_out = h_in + 2 * ph - kh + 1
        w_out = w_in + 2 * pw - kw + 1
        wires = self.wires
        if wires > 10:
            warnings.warn(f"Too many wires ({wires}). "
                          "This might cause performance issues.")

        weights = self.param("qweights", qconv_uniform(),
                             (self.qdepth, wires, 3))

        # unfold: (b, C*kh*kw, h_out*w_out) with (c, kh, kw)-major features,
        # matching torch.nn.Unfold
        patches = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), (1, 1), [(ph, ph), (pw, pw)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        feats = patches.reshape(b, c * kh * kw, h_out * w_out)
        feats = jnp.transpose(feats, (0, 2, 1)).reshape(-1, c * kh * kw)
        feats = feats + 0.1  # reference nn/qconv.py:78 (avoid zero patches)

        if self.compat_dead_qnode:
            # released behavior: post-process raw pixels, never run the circuit
            q = feats
            q = jnp.clip(q * q.shape[-1] * 0.5, 0.0, 1.0)
            q = q[:, ::2]                  # drop |...1> amplitudes
            q = q[:, : self.out_channels]
        else:
            # The postprocess (reference nn/qconv.py:58-69) keeps only the
            # EVEN probability rows 0, 2, ..., 2*(Cout-1): dead-output
            # elimination slices the composed unitary to those Cout rows
            # before the patch matmul. And the embedded state is REAL
            # (real patches, constant pad, L2 norm), so probs reduce to
            # (psi @ Ur^T)^2 + (psi @ Ui^T)^2 — two real (P, d) @ (d, Cout)
            # matmuls instead of a full complex (P, d) @ (d, d) (4 real
            # matmuls at d columns). Same math as probs(U psi) sliced;
            # measured 8.6x on the UNet QConv training row
            # (results/qconv_roofline.json, DESIGN.md QConv section).
            from .. import config as _config

            u = sel_unitary(qw_tanh(weights), imprimitive="cnot")
            dim = 2 ** wires
            n_rows = min(self.out_channels, dim - dim // 2)
            rows = 2 * jnp.arange(n_rows)
            psi = amplitude_embed(feats, wires, pad_with=0.5,
                                  dtype=jnp.real(u).dtype)
            ur = jnp.real(u)[rows]         # (n_rows, d)
            ui = jnp.imag(u)[rows]
            prec = _config.matmul_precision()
            pr = jnp.matmul(psi, ur.T, precision=prec)
            pi = jnp.matmul(psi, ui.T, precision=prec)
            # the reference scales by the FULL probs width (2**wires)
            q = jnp.clip((pr * pr + pi * pi) * dim * 0.5, 0.0, 1.0)

        if q.shape[-1] < self.out_channels:
            q = jnp.pad(q, ((0, 0), (0, self.out_channels - q.shape[-1])))
        return jnp.transpose(
            q.reshape(b, h_out, w_out, self.out_channels), (0, 3, 1, 2))

    def __repr__(self):
        return (f"QConv2d({self.in_channels}, {self.out_channels}, "
                f"kernel_size={self.kernel_size}, padding={self.padding}, "
                f"wires={self.wires})")


def _prep_unitary(vecs):
    """State-preparation unitaries: U|0..0> = v for each row of ``vecs``.

    Householder completion: U = I - 2 w w^dagger with w ∝ (e0 - v). The
    reference uses MottonenStatePreparation here (nn/qconv.py:184, :266);
    on mid-circuit states the two differ by a unitary fixing |0..0> — see
    COMPAT.md. vecs: (b, d) normalized real/complex -> (b, d, d).
    """
    b, d = vecs.shape
    e0 = jnp.zeros((b, d), vecs.dtype).at[:, 0].set(1.0)
    # phase-align so that <e0, v> is real (Householder then maps e0 -> v)
    phase = jnp.where(jnp.abs(vecs[:, :1]) > 1e-9,
                      vecs[:, :1] / jnp.maximum(jnp.abs(vecs[:, :1]), 1e-12),
                      jnp.ones((b, 1), vecs.dtype))
    v = vecs * jnp.conj(phase)
    w = e0 - v
    nrm = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=1, keepdims=True))
    w = w / jnp.maximum(nrm, 1e-12)
    eye = jnp.eye(d, dtype=vecs.dtype)[None]
    house = eye - 2.0 * w[:, :, None] * jnp.conj(w)[:, None, :]
    return phase[:, :, None] * house


class QConv2dMedium(nn.Module):
    """Per-in-channel chained state preparations + per-channel SEL.

    Reference ``_QConv2d_MEDIUM`` (nn/qconv.py:129-216): pad input with the
    0.01 constant, unfold k x k patches per channel, L2-normalize, then for
    every in-channel: state-prepare that channel's patch and apply that
    channel's SEL — all chained on the SAME wires — and read probabilities.
    ``_QConv2d_SLOW`` (nn/qconv.py:219-304) computes the identical circuit
    per patch in a Python loop; both map onto this batched module
    (``QConv2dSlow`` is an alias).
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (1, 1)
    qdepth: int = 2

    @property
    def wires(self) -> int:
        kh, kw = self.kernel_size
        return max(math.ceil(math.log2(kh * kw)),
                   math.ceil(math.log2(self.out_channels)), 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, c, h_in, w_in = x.shape
        assert c == self.in_channels
        kh, kw = self.kernel_size
        ph, pw = self.padding
        h_out = h_in + 2 * ph - kh + 1
        w_out = w_in + 2 * pw - kw + 1
        wires = self.wires
        dim = 2**wires

        weights = self.param(
            "qweights",
            lambda key, shape: jax.random.uniform(key, shape),
            (self.in_channels, self.qdepth, wires, 3))

        # constant-pad 0.01 (reference nn/qconv.py:160-162), then patches
        xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)),
                     constant_values=0.01)
        patches = jax.lax.conv_general_dilated_patches(
            xp, (kh, kw), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        # (b, c*kh*kw, h_out*w_out) -> (b*positions, c, k*k)
        feats = patches.reshape(b, c, kh * kw, h_out * w_out)
        feats = jnp.transpose(feats, (0, 3, 1, 2)).reshape(-1, c, kh * kw)
        if kh * kw < dim:
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, dim - kh * kw)),
                            constant_values=0.01)
        nrm = jnp.sqrt(jnp.sum(feats * feats, axis=-1, keepdims=True))
        feats = feats / jnp.maximum(nrm, 1e-12)

        from ..sim.sel import sel_unitary
        from ..sim.statevector import probs, zero_state

        states = zero_state(feats.shape[0], wires)
        for ic in range(self.in_channels):
            prep = _prep_unitary(feats[:, ic].astype(states.dtype))
            states = jnp.einsum("bij,bj->bi", prep, states)
            u = sel_unitary(weights[ic], imprimitive="cnot").astype(
                states.dtype)
            states = states @ u.T
        q = probs(states)
        q = jnp.clip(q * q.shape[-1] * 0.5, 0.0, 1.0)
        q = q[:, : self.out_channels]
        if q.shape[-1] < self.out_channels:
            q = jnp.pad(q, ((0, 0), (0, self.out_channels - q.shape[-1])))
        return jnp.transpose(
            q.reshape(b, h_out, w_out, self.out_channels), (0, 3, 1, 2))


QConv2dSlow = QConv2dMedium  # identical circuit, reference loops per patch
