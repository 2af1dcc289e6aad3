"""Circuit engine: the reference's three circuit families as batched programs.

Families (SURVEY §2.2 collapses the 27 reference classes onto these):

* ``qdense``   — AmplitudeEmbedding -> SEL(depth) -> probs
                 (reference nn/qdense.py:40-47)
* ``reupload`` — N blocks of [L x (per-wire RZ/RY encode -> SEL(k, CZ))]
                 with probs or PauliZ readout (reference nn/qdense.py:422-441,
                 :1299-1307)
* ``qnn``      — single per-wire RZ encode -> SEL(depth, CZ) -> PauliZ
                 (reference nn/qdense.py:338-344)

Each family runs on the statevector backend; circuits containing non-unitary
channels (amplitude damping / depolarizing / phase damping) switch to the
density-matrix backend automatically. Everything is shaped for jit: Python
loops only over static trace-time structure (L, N, wires).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import config as _config
from . import channels as ch
from . import density as dm
from .gates import WEIGHT_MAPS
from .sel import sel_unitary
from .statevector import (
    amplitude_embed,
    apply_unitary,
    expval_z,
    probs,
    ry_product_state,
    rz_phases,
    zero_state,
)


@dataclasses.dataclass(frozen=True)
class NoiseModel:
    """A hardware-noise channel injected per wire.

    placement:
      * ``"encode"`` — after each data-encoding rotation, inside every
        spectrum layer (QIDDM family, reference nn/qdense.py:1406-1416)
      * ``"end"``    — once at the end of the circuit (Qdense/QNN_A family,
        reference nn/qdense.py:98-104, :174-180)

    ``strength`` may be a Python float (baked into the program) or a TRACED
    jnp scalar — every consumer (Kraus builders, closed-form channel masks,
    encode over-rotation) is smooth in it, so test-time intensity sweeps
    compile ONE program per (circuit, kind) and vmap over the intensity.
    Never hash/compare NoiseModels holding traced strengths.
    """

    kind: str
    strength: object   # float | jnp scalar
    placement: str = "end"

    @property
    def is_unitary(self) -> bool:
        return self.kind in ("phase_shift", "rot_angle")


# (channel kind, strength) per reference family for add_noise codes 1..3.
_FAMILY_NOISE = {
    # reference nn/qdense.py:98-104 (QDenseUndirected_old_noise) and
    # :431-439 (differN_noise): noise once at circuit end.
    "qdense": {1: ("phase_shift", 0.05), 2: ("amplitude_damping", 0.1),
               3: ("depolarizing", 0.02), "placement": "end"},
    # reference nn/qdense.py:174-180 (QNN_A): end placement.
    "qnn_a": {1: ("phase_damping", 0.05), 2: ("amplitude_damping", 0.05),
              3: ("depolarizing", 0.02), "placement": "end"},
    # reference nn/qdense.py:255-261 (QNN_noise): after each encode gate.
    "qnn": {1: ("phase_damping", 0.03), 2: ("amplitude_damping", 0.05),
            3: ("depolarizing", 0.02), "placement": "encode"},
    # reference nn/qdense.py:520-526 (differN_noise_befor): encode placement.
    "differn_befor": {1: ("phase_damping", 0.03), 2: ("amplitude_damping", 0.05),
                      3: ("depolarizing", 0.02), "placement": "encode"},
    # reference nn/qdense.py:1410-1416 (QIDDM_* family; note the 0.9
    # depolarizing strength is faithful to the reference).
    "qiddm": {1: ("phase_damping", 0.03), 2: ("amplitude_damping", 0.05),
              3: ("depolarizing", 0.9), "placement": "encode"},
}


def noise_from_code(code: int, family: str,
                    intensity: Optional[float] = None) -> Optional[NoiseModel]:
    """Map the reference's ``add_noise`` integer to a NoiseModel.

    ``code == 4`` is the "Rotation Angle error" swept by reference
    src/mnist_noise.py:432 whose circuit branch is missing from the release
    (SURVEY §8.8); reconstructed as a deterministic encoding over-rotation of
    ``intensity`` radians. ``intensity`` also overrides the per-family
    strength for codes 1-3 when given (the ``noise_intensity`` sweep).
    """
    if code == 0:
        return None
    table = _FAMILY_NOISE[family]
    placement = table["placement"]
    if code == 4:
        if intensity is None:
            raise ValueError(
                "add_noise=4 (Rotation Angle error) requires an explicit "
                "noise intensity — a silent 0.0 would be a no-op labeled "
                "as a noise run")
        if isinstance(intensity, (int, float)):
            intensity = float(intensity)
        return NoiseModel("rot_angle", intensity, "encode")
    kind, strength = table[code]
    if intensity is not None:
        strength = (float(intensity)
                    if isinstance(intensity, (int, float)) else intensity)
    return NoiseModel(kind, strength, placement)


def _kraus_array(noise: NoiseModel, dtype) -> jnp.ndarray:
    ks = ch.kraus_for(noise.kind, noise.strength)
    return jnp.stack([jnp.asarray(k) for k in ks]).astype(dtype)



def _apply_noise_all_wires(rho, noise: NoiseModel, cdtype):
    """Per-wire channel application, routed to the closed-form fast paths
    (density.apply_channel_all_wires) for the three reference channel
    kinds; generic Kraus otherwise."""
    try:
        return dm.apply_channel_all_wires(rho, noise.kind, noise.strength)
    except KeyError:
        return dm.apply_kraus_all_wires(rho, _kraus_array(noise, cdtype))


def _needs_dm(noise: Optional[NoiseModel]) -> bool:
    return noise is not None and not noise.is_unitary


def _batch_traced(*xs) -> bool:
    """True when any arg carries a vmap BatchTracer — i.e. this circuit
    call is inside an outer jax.vmap (label-/trial-stacked programs).

    BatchTracers can hide UNDER AD tracers (vmap(grad(f)) presents
    LinearizeTracer(primal=BatchTracer)), so wrappers are unwrapped
    through their primal/value attributes rather than isinstance-checked
    at the top level only. Known hole: vmap OF an already-jitted function
    batches the traced jaxpr without re-running this Python, so it cannot
    be detected here — compose as jit(vmap(...)) (as every in-repo caller
    does)."""
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # public path on older jax
        from jax.interpreters.batching import BatchTracer

    def carries_batch(x, depth=0):
        if isinstance(x, BatchTracer):
            return True
        if depth >= 8:
            return False
        for attr in ("primal", "tangent", "val"):
            inner = getattr(x, attr, None)
            if inner is not None and carries_batch(inner, depth + 1):
                return True
        return False

    return any(carries_batch(x) for x in xs)


def _ad_traced(*xs) -> bool:
    """True when any arg carries an AD tracer — i.e. this call is under
    jax.grad (LinearizeTracer) or jax.jvp (JVPTracer). Used to route AWAY
    from Pallas programs that define no VJP rule (the fused dm block
    kernel); the gate-chain kernels have custom VJPs and stay on."""
    try:
        from jax._src.interpreters.ad import JVPTracer, LinearizeTracer
    except ImportError:
        # private path moved: claim no-AD — differentiation then fails
        # LOUDLY at the kernel's missing VJP rather than silently
        # degrading every forward pass off the fused kernel
        return False

    return any(isinstance(x, (JVPTracer, LinearizeTracer)) for x in xs)


def _use_adjoint(wires: int, on_tpu: bool) -> bool:
    """Adjoint-mode routing (config.adjoint_mode): "on" everywhere,
    "off" nowhere, "auto" on the wide gate-level regime — beyond the
    Pallas width cap on TPU, and from the off-TPU wide threshold where
    the engine already prefers gate-level application. There autodiff's
    per-gate state residuals are the memory ceiling and the adjoint
    reverse-walk removes them (sim/adjoint.py). The single definition of
    the policy: every gate-chain call site routes through this."""
    mode = _config.adjoint_mode()
    if mode == "on":
        return True
    if mode == "off":
        return False
    return (wires > _config.pallas_max_wires()
            or (not on_tpu and wires >= 9))


def _use_wide(wires: int, on_tpu: bool) -> bool:
    """Grouped-contraction routing (config.wide_mode, sim/wide.py): "on"
    wherever an adjoint chain is eligible, "off" never, "auto" on the
    TPU wide regime — beyond the Pallas width cap, where the per-gate
    adjoint chain pays ``wires`` bandwidth-bound HBM passes per sublayer
    and the grouped MXU contractions measured 15.6x faster (w=20, see
    tools/bench_wide_micro.py). wide chains are custom-VJP (reverse-mode
    only), so adjoint_mode "off" — the forward-autodiff escape hatch —
    disables them exactly like the per-gate adjoint path."""
    mode = _config.wide_mode()
    if _config.adjoint_mode() == "off":
        return False
    if mode == "on":
        return True
    if mode == "off":
        return False
    # "auto" on TPU: beyond the Pallas width cap, AND from wide_min_wires
    # up even under the cap — the on-chip route A/B measured the grouped
    # MXU contractions beating the fused Pallas chain kernels from w=9
    # (1.5-2.9x by w=10, the 28x28 models' width) with seconds-not-minutes
    # compiles (config.py::wide_min_wires, results/narrow_route_ab*.json).
    return on_tpu and (wires >= _config.wide_min_wires()
                       or wires > _config.pallas_max_wires())


def _sel_small_batch(states, w, imprimitive: str, cdtype):
    """Small-batch SEL application (batch < 2**wires): the fused Pallas
    SEL-chain kernel on TPU/complex64 (states stay VMEM-resident for the
    whole depth — covers CNOT and CZ rings), else gate-by-gate lax.scan
    (CPU / x64 parity mode). Measured trade-offs: DESIGN.md §3.

    Under an OUTER vmap (label-stacked training) the call routes to the
    XLA gate path: jax's default pallas batching rule for this kernel
    kernel-faulted the TPU worker (observed on the vmapped Qdense EMNIST
    run), while the XLA path vmaps natively."""
    import jax


    if (_config.use_pallas() and jax.default_backend() == "tpu"
            and cdtype == jnp.complex64
            and w.shape[1] <= _config.pallas_max_wires()  # VMEM cap
            # from wide_min_wires up the grouped-Kronecker chain measured
            # faster than this kernel (routing note at _use_wide)
            and not (w.shape[1] >= _config.wide_min_wires()
                     and _use_wide(w.shape[1], True))
            and not _batch_traced(states, w)):
        from .gates import rot_matrix
        from .pallas_gate_kernel import sel_chain_pallas

        mats = rot_matrix(w[..., 0], w[..., 1], w[..., 2])
        return sel_chain_pallas(states, mats, w.shape[1],
                                imprimitive=imprimitive).astype(cdtype)
    on_tpu = jax.default_backend() == "tpu"
    if _use_wide(w.shape[1], on_tpu):
        from .wide import sel_chain_wide

        return sel_chain_wide(states, w, imprimitive=imprimitive)
    if _use_adjoint(w.shape[1], on_tpu):
        from .adjoint import sel_chain_adjoint

        return sel_chain_adjoint(states, w, imprimitive=imprimitive)
    from .sel import sel_apply_gates

    return sel_apply_gates(states, w, imprimitive=imprimitive)


# ---------------------------------------------------------------------------
# qdense family
# ---------------------------------------------------------------------------

def qdense_circuit(x, weights, *, wires: int, pad_with: float = 0.1,
                   weight_map: str = "qw_tanh", imprimitive: str = "cnot",
                   noise: Optional[NoiseModel] = None, cdtype=None,
                   n_traj: int = 0, traj_key=None):
    """AmplitudeEmbedding -> SEL -> (noise) -> probs.

    x: (batch, n_features); weights: (depth, wires, 3). Returns (batch, 2**w)
    probabilities. Reference: nn/qdense.py:40-47 / :95-105.

    ``n_traj > 0`` (with ``traj_key``) estimates the channel with the
    Monte-Carlo trajectory backend instead of the density matrix —
    O(n_traj 2^w) instead of O(4^w), the noisy route past
    ``density.MAX_DM_WIRES`` (sim/trajectories.py).
    """
    if cdtype is None:
        from .. import config as _cfg

        cdtype = _cfg.complex_dtype()
    if x.shape[-1] > 2**wires:
        raise ValueError(
            f"{x.shape[-1]} features do not fit in {wires} wires"
        )
    if n_traj and _needs_dm(noise):
        from .trajectories import qdense_circuit_trajectories

        return qdense_circuit_trajectories(
            x, weights, key=traj_key, n_traj=n_traj, noise=noise,
            wires=wires, pad_with=pad_with, weight_map=weight_map,
            imprimitive=imprimitive, cdtype=cdtype)
    w = WEIGHT_MAPS[weight_map](weights)
    states = amplitude_embed(x, wires, pad_with=pad_with, dtype=cdtype)
    if x.shape[0] >= 2**wires:
        u = sel_unitary(w, imprimitive=imprimitive).astype(cdtype)
        states = apply_unitary(states, u)
    else:
        # batch < state dim: gate-level application is O(depth w b d) vs
        # O(depth d^2 (assembly + b)) for per-layer unitaries — measured
        # 3.4x faster fwd+bwd at (depth=60, wires=10, b=11) on the v5e
        # even in pure XLA, and the fused Pallas chain beats that again
        # (DESIGN.md "gate-level vs unitary"). Ranges cycle over the full
        # depth (one deep template, not per-block restarts).
        states = _sel_small_batch(states, w, imprimitive, cdtype)
    if noise is None or noise.kind == "phase_shift":
        # phase shift is diagonal: probs unchanged — skip it entirely.
        return probs(states)
    if noise.kind == "rot_angle":
        return probs(states)
    rho = dm.from_statevector(states)
    rho = _apply_noise_all_wires(rho, noise, cdtype)
    return dm.probs(rho)


# ---------------------------------------------------------------------------
# re-uploading family (QIDDM / differN)
# ---------------------------------------------------------------------------

def _encode_angles(x, encode: str, noise: Optional[NoiseModel]):
    if encode == "rz_halfpi":
        x = (jnp.pi * 0.5) * x
    if noise is not None and noise.kind == "rot_angle" and noise.placement == "encode":
        x = x + noise.strength
    return x


def reupload_block(x_enc, block_weights, *, encode: str = "rz",
                   imprimitive: str = "cz",
                   noise: Optional[NoiseModel] = None,
                   readout: str = "probs", cdtype=None, mesh=None,
                   mesh_axis: str = "data", n_traj: int = 0, traj_key=None):
    """One N-block: L x (encode -> SEL(k)) -> readout.

    x_enc: (batch, wires) encoding angles (re-uploaded in every spectrum
    layer, reference nn/qdense.py:1302-1305); block_weights: (L, k, wires, 3).
    readout: "probs" -> (batch, 2**w) or "expvalz" -> (batch, wires).

    With ``mesh``, the statevector dimension shards over ``mesh[mesh_axis]``
    (sim/sharded.py) — the scaling route for wire counts beyond single-chip
    memory (the reference caps at 10 wires; the sharded path is tested to
    16). Noise channels are not supported on the sharded path.
    """
    import jax

    from .sel import sel_layer_unitaries, sel_unitaries

    if cdtype is None:
        from .. import config as _cfg

        cdtype = _cfg.complex_dtype()
    L, k, wires, _ = block_weights.shape
    batch = x_enc.shape[0]
    dim = 2**wires

    if mesh is not None:
        if _needs_dm(noise) and not n_traj:
            raise NotImplementedError(
                "noise channels on the mesh-sharded statevector path need "
                "the trajectory backend: pass n_traj=.../traj_key=... "
                "(sim/trajectories.py)")
        from .sharded import reupload_block_sharded

        # the sharded program applies the halfpi scaling itself; only the
        # encode-placement rot_angle offset happens here. The dense path
        # (_encode_angles) adds the over-rotation AFTER scaling — match it
        # by pre-dividing the strength by the scale the program will apply.
        x_shard = x_enc
        if (noise is not None and noise.kind == "rot_angle"
                and noise.placement == "encode"):
            scale = jnp.pi * 0.5 if encode == "rz_halfpi" else 1.0
            x_shard = x_shard + noise.strength / scale
        traj_kw = {}
        if _needs_dm(noise):
            traj_kw = {"noise_kind": noise.kind,
                       "noise_strength": noise.strength,
                       "traj_key": traj_key, "n_traj": n_traj,
                       "noise_placement": noise.placement}
        return reupload_block_sharded(
            x_shard, block_weights, mesh, axis=mesh_axis,
            imprimitive=imprimitive, encode=encode, readout=readout,
            dtype=cdtype, **traj_kw)

    x_enc = _encode_angles(x_enc, encode, noise)

    if n_traj and _needs_dm(noise):
        # Monte-Carlo trajectory backend: O(n_traj 2^w) channel estimation
        # on statevectors — the noisy route past density.MAX_DM_WIRES
        # (sim/trajectories.py). x_enc already carries halfpi/rot-angle
        # transforms, so rz vs rz_halfpi is immaterial past this point.
        from .trajectories import reupload_block_trajectories

        return reupload_block_trajectories(
            x_enc, block_weights, key=traj_key, n_traj=n_traj, noise=noise,
            encode=encode, imprimitive=imprimitive, readout=readout,
            cdtype=cdtype)

    if not _needs_dm(noise):

        # Strategy ladder:
        # * batch >= dim: compose each block into one unitary (MXU matmuls,
        #   O(k d^3) amortized over a big batch);
        # * batch < dim, TPU, CZ ring + RZ/RY encode (every QIDDM/differN
        #   config incl. QIDDM_PL_noise1): gate-level Pallas kernel — never
        #   materializes a unitary (O(L k w B d) elementwise work; beats
        #   the unitary-streaming kernel at every dim, see
        #   pallas_kernels.py);
        # * otherwise: per-layer unitaries applied by lax.scan.
        compose = batch >= dim
        on_tpu = jax.default_backend() == "tpu"
        use_gate_kernel = (
            not compose and _config.use_pallas() and on_tpu
            and encode in ("rz", "rz_halfpi", "ry") and imprimitive == "cz"
            and cdtype == jnp.complex64  # kernels carry float32 planes
            and wires <= _config.pallas_max_wires()  # Mosaic compile cap
            # from wide_min_wires up the grouped-Kronecker chain measured
            # faster than this kernel (routing note at _use_wide)
            and not (wires >= _config.wide_min_wires()
                     and _use_wide(wires, on_tpu))
            # under an outer vmap (label-vmapped training, vmapped sweeps)
            # jax's default pallas batching rule would batch the kernel
            # itself, which kernel-faults the TPU worker — same guard as
            # the sel/qnn/dm routes (:220, :525, :675)
            and not _batch_traced(x_enc, block_weights)
        )
        if use_gate_kernel:
            from .gates import rot_matrix
            from .pallas_gate_kernel import gate_chain_planes, ry_chain_planes
            from .statevector import (expval_z_from_planes, probs_from_planes,
                                      rz_phase_planes)

            # plane-level route end to end: phases built directly in the
            # kernel's (d, B) layout, readout computed from the output
            # planes — the complex-assembly + transpose boundary (and its
            # VJP) measured ~0.4 ms/block at d=1024, B=80, ~40% of a
            # differN training step.
            flat = block_weights.reshape(L * k, wires, 3)
            mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
            if encode == "ry":
                sr, si = ry_chain_planes(x_enc, mats, k, wires)
            else:
                pr_, pi_ = rz_phase_planes(x_enc, wires)
                sr, si = gate_chain_planes(pr_, pi_, mats, k, wires)
            if readout == "probs":
                return probs_from_planes(sr, si)
            return expval_z_from_planes(sr, si)
        # Wide circuits: the per-layer-unitary fallback materializes
        # (L, k, d, d) — ~4 GB at 12 wires, 1 TB at 16 — so beyond the
        # Pallas cap apply SEL gate-by-gate instead: O(L k w B d) work
        # and O(L k w) weight memory, structured as scan-over-L so the
        # program size is constant in depth. This is the single-chip wide
        # path; the mesh-sharded path (mesh=...) layers on top of it.
        # Off-TPU the same route also takes over from wires >= 9: there
        # the per-layer-unitary assembly (O(L k w d^3) scalar matmuls per
        # step) is catastrophic — a differN (L=15, 10 wires) CPU training
        # step pays ~64 GFLOP assembling unitaries vs ~3 MFLOP gate-level.
        # On TPU the assembly is MXU work and stays the better trade.
        # Adjoint-mode differentiation for the gate-level regime: autodiff
        # through the scan below stores every intermediate state (L*k*w of
        # them) while the adjoint backward reconstructs them through
        # inverse gates (sim/adjoint.py) — same math, O(1) residuals,
        # which is what lets 16+-wire differN configs train single-chip
        # at all. "auto" engages exactly where the gate-level paths run
        # (_use_adjoint); "on" forces it at any width (A/B, tests).
        # Grouped-contraction wide chain (sim/wide.py): same O(1)-residual
        # adjoint backward, but each sublayer's w per-gate HBM passes
        # collapse into ceil(w/7) MXU group contractions (+ring).
        if not compose and _use_wide(wires, on_tpu):
            from .wide import reupload_chain_wide

            states = reupload_chain_wide(
                x_enc, block_weights, encode=encode,
                imprimitive=imprimitive, cdtype=cdtype)
            if readout == "probs":
                return probs(states)
            return expval_z(states)
        if not compose and _use_adjoint(wires, on_tpu):
            from .adjoint import reupload_chain_adjoint

            states = reupload_chain_adjoint(
                x_enc, block_weights, encode=encode,
                imprimitive=imprimitive, cdtype=cdtype)
            if readout == "probs":
                return probs(states)
            return expval_z(states)
        if not compose and (wires > _config.pallas_max_wires()
                            or (not on_tpu and wires >= 9)):
            from .sel import sel_apply_gates

            states = zero_state(batch, wires, dtype=cdtype)
            if encode in ("rz", "rz_halfpi"):
                phases = rz_phases(x_enc, wires)

            def gate_body(states, w_l):  # w_l: (k, wires, 3)
                if encode in ("rz", "rz_halfpi"):
                    states = states * phases
                else:
                    from .statevector import apply_ry_all

                    states = apply_ry_all(states, x_enc)
                return sel_apply_gates(states, w_l,
                                       imprimitive=imprimitive), None

            states, _ = jax.lax.scan(gate_body, states, block_weights)
            if readout == "probs":
                return probs(states)
            return expval_z(states)

        if compose:
            us = sel_unitaries(block_weights,
                               imprimitive=imprimitive).astype(cdtype)
        else:
            lus = sel_layer_unitaries(block_weights,
                                      imprimitive=imprimitive).astype(cdtype)
        states = zero_state(batch, wires, dtype=cdtype)

        def encode_states(states):
            if encode in ("rz", "rz_halfpi"):
                return states * phases
            from .statevector import apply_ry_all

            return apply_ry_all(states, x_enc)

        if encode in ("rz", "rz_halfpi"):
            phases = rz_phases(x_enc, wires)

        if compose:
            def body(states, u):
                return apply_unitary(encode_states(states), u), None

            states, _ = jax.lax.scan(body, states, us)
        else:
            def body(states, us_l):  # us_l: (k, d, d)
                states = encode_states(states)
                for li in range(k):
                    states = apply_unitary(states, us_l[li])
                return states, None

            states, _ = jax.lax.scan(body, states, lus)
        if readout == "probs":
            return probs(states)
        return expval_z(states)

    # density-matrix path (damping/depolarizing channels inside the loop).
    # SEL strategy (config.dm_unitary_mode): "gates" applies the chain to
    # both sides of rho via density.apply_chain_two_sided (O(L k w b d^2)
    # elementwise, Pallas-fused on TPU); "matmul" is the composed-unitary
    # sandwich (O(L b d^3) MXU). Measured A/B: results/dm_unitary_ab.json.
    dm_gates = _config.dm_unitary_mode() == "gates"
    rho = dm.zero_density(batch, wires, dtype=cdtype)
    phases = rz_phases(x_enc, wires) if encode in ("rz", "rz_halfpi") else None

    def encode_rho(rho):
        if phases is not None:
            return dm.apply_diag(rho, phases)
        if dm_gates:
            from .statevector import apply_ry_all

            x_cols = jnp.repeat(x_enc, dim, axis=0)  # column-batch angles
            return dm.apply_chain_two_sided(
                rho, lambda cols: apply_ry_all(cols, x_cols))
        # RY per wire on a density matrix via its 2x2 unitaries
        from .gates import ry_matrix

        for j in range(wires):
            g = ry_matrix(x_enc[:, j]).astype(cdtype)  # (b, 2, 2)
            rho = _apply_1q_batched_unitary(rho, g, j, wires)
        return rho

    if dm_gates:
        strength = noise.strength if noise is not None else None
        pallas_ok = (
            _config.use_pallas() and jax.default_backend() == "tpu"
            and cdtype == jnp.complex64
            and wires <= _config.pallas_max_wires()
            and not _batch_traced(x_enc, block_weights, strength))
        # Fully-fused dm block kernel: the whole L x [encode -> channel ->
        # SEL] chain in ONE Pallas program with rho VMEM-resident as
        # (d, b*d) planes — the dm step is otherwise per-op-overhead-bound
        # (~50 tiny XLA ops per spectrum layer; see pallas_dm_kernel.py).
        from .pallas_dm_kernel import KIND_IDS

        if (pallas_ok and imprimitive == "cz"
                and noise.placement == "encode"
                and noise.kind in KIND_IDS
                and batch * dim * dim <= (1 << 22)  # plane VMEM cap
                # no VJP rule on the fused kernel: under AD fall through
                # to the two-sided gate chains (custom-VJP) below
                and not _ad_traced(x_enc, block_weights, strength)):
            from .gates import rot_matrix
            from .pallas_dm_kernel import dm_reupload_chain_pallas

            flat = block_weights.reshape(L * k, wires, 3)
            mats = rot_matrix(flat[..., 0], flat[..., 1], flat[..., 2])
            rho = dm_reupload_chain_pallas(
                phases, mats, k, wires, noise.kind, noise.strength,
                ry_angles=(None if phases is not None else x_enc),
            ).astype(cdtype)
            if readout == "probs":
                return dm.probs(rho)
            return dm.expval_z(rho)
        # The two-sided chain runs on COLUMN batches of b*d lanes, so its
        # (d, b*d) float32 planes carry batch*dim*dim elements — the same
        # VMEM budget as the fused kernel's rho planes. Past the cap the
        # XLA gate path takes over (wires <= 10 shapes above the cap are
        # exactly the wide-batch dm sweeps, e.g. w=10 x batch 10).
        use_pallas_chain = pallas_ok and batch * dim * dim <= (1 << 22)

        def sel_rho(rho, w_l):  # w_l: (k, wires, 3)
            if use_pallas_chain:
                from .gates import rot_matrix
                from .pallas_gate_kernel import sel_chain_pallas

                mats = rot_matrix(w_l[..., 0], w_l[..., 1], w_l[..., 2])
                chain = lambda s: sel_chain_pallas(
                    s, mats, wires, imprimitive=imprimitive).astype(cdtype)
            else:
                from .sel import sel_apply_gates

                chain = lambda s: sel_apply_gates(
                    s, w_l, imprimitive=imprimitive)
            return dm.apply_chain_two_sided(rho, chain)

        def body(rho, w_l):
            rho = encode_rho(rho)
            if noise.placement == "encode":
                rho = _apply_noise_all_wires(rho, noise, cdtype)
            return sel_rho(rho, w_l), None

        rho, _ = jax.lax.scan(body, rho, block_weights)
    else:
        us = sel_unitaries(block_weights,
                           imprimitive=imprimitive).astype(cdtype)

        def body(rho, u):
            rho = encode_rho(rho)
            if noise.placement == "encode":
                rho = _apply_noise_all_wires(rho, noise, cdtype)
            return dm.apply_unitary(rho, u), None

        rho, _ = jax.lax.scan(body, rho, us)
    if noise.placement == "end":
        rho = _apply_noise_all_wires(rho, noise, cdtype)
    if readout == "probs":
        return dm.probs(rho)
    return dm.expval_z(rho)


def _apply_1q_batched_unitary(rho, gate, wire: int, wires: int):
    """rho -> G rho G^dagger with a per-sample (b,2,2) single-qubit gate."""
    b = rho.shape[0]
    left = 2**wire
    right = 2 ** (wires - wire - 1)

    r = rho.reshape(b, left, 2, right, left, 2, right)
    out = jnp.einsum("bxy,blyrmzs,bwz->blxrmws", gate, r, jnp.conj(gate),
                     precision=_config.matmul_precision())
    return out.reshape(b, left * 2 * right, left * 2 * right)


# ---------------------------------------------------------------------------
# qnn family
# ---------------------------------------------------------------------------

def qnn_circuit(x, weights, *, encode: str = "rz", imprimitive: str = "cz",
                weight_map: str = "none", noise: Optional[NoiseModel] = None,
                readout: str = "expvalz", cdtype=None,
                n_traj: int = 0, traj_key=None):
    """Single encode -> SEL(depth) -> readout.

    x: (batch, wires); weights: (depth, wires, 3).

    Faithfulness note: with RZ encoding on the fresh |0..0> state the input
    contributes only a global phase (reference nn/qdense.py:338-344 — the
    QNN circuit output is therefore input-independent; the surrounding
    linear layers do the learning). This implementation reproduces that.
    """
    if cdtype is None:
        from .. import config as _cfg

        cdtype = _cfg.complex_dtype()
    wires = x.shape[-1]
    w = WEIGHT_MAPS[weight_map](weights)
    x = _encode_angles(x, encode, noise)

    if n_traj and _needs_dm(noise):
        from .trajectories import qnn_circuit_trajectories

        return qnn_circuit_trajectories(
            x, weights, key=traj_key, n_traj=n_traj, noise=noise,
            encode=encode, imprimitive=imprimitive, weight_map=weight_map,
            readout=readout, cdtype=cdtype)

    if not _needs_dm(noise):
        if encode == "ry":
            states = ry_product_state(x, wires, dtype=cdtype)
        else:
            states = zero_state(x.shape[0], wires, dtype=cdtype) * rz_phases(x, wires)
        if x.shape[0] >= 2**wires:
            u = sel_unitary(w, imprimitive=imprimitive).astype(cdtype)
            states = apply_unitary(states, u)
        else:
            # small batch: gate-level (same measured trade-off as
            # qdense_circuit above)
            states = _sel_small_batch(states, w, imprimitive, cdtype)
        # (a trailing phase_shift is diagonal: probs/Z-expectations unchanged)
        return probs(states) if readout == "probs" else expval_z(states)

    if encode == "ry":
        rho = dm.from_statevector(ry_product_state(x, wires, dtype=cdtype))
    else:
        rho = dm.zero_density(x.shape[0], wires, dtype=cdtype)
        rho = dm.apply_diag(rho, rz_phases(x, wires))
    if noise.placement == "encode":
        rho = _apply_noise_all_wires(rho, noise, cdtype)
    if _config.dm_unitary_mode() == "gates":
        import jax

        from .sel import sel_apply_gates

        if (_config.use_pallas() and jax.default_backend() == "tpu"
                and cdtype == jnp.complex64
                and wires <= _config.pallas_max_wires()
                # column-batch plane cap (see reupload dm route above)
                and x.shape[0] * 4**wires <= (1 << 22)
                and not _batch_traced(x, w, noise.strength)):
            from .gates import rot_matrix
            from .pallas_gate_kernel import sel_chain_pallas

            mats = rot_matrix(w[..., 0], w[..., 1], w[..., 2])
            chain = lambda s: sel_chain_pallas(
                s, mats, wires, imprimitive=imprimitive).astype(cdtype)
        else:
            chain = lambda s: sel_apply_gates(s, w, imprimitive=imprimitive)
        rho = dm.apply_chain_two_sided(rho, chain)
    else:
        u = sel_unitary(w, imprimitive=imprimitive).astype(cdtype)
        rho = dm.apply_unitary(rho, u)
    if noise.placement == "end":
        rho = _apply_noise_all_wires(rho, noise, cdtype)
    return dm.probs(rho) if readout == "probs" else dm.expval_z(rho)
