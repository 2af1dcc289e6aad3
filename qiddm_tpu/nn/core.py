"""The four quantum-denoiser families behind the reference's 27 classes.

SURVEY §2.2: the reference model zoo collapses to (a) Qdense, (b) QNN_A,
(c) QNN, (d) the re-uploading QIDDM/differN family parameterized by
down-projection x up-projection x readout x encode x extras. These flax
modules implement the *intended* math (batched, differentiable end-to-end;
the reference's gradient-severing ``torch.tensor(...)`` wraps and per-sample
Python loops are deliberately not reproduced — see COMPAT.md).

All modules take NCHW images ``(b, 1, w, h)`` and return the same shape.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import pca as pca_mod
from ..sim import engine
from .initializers import qweight_init
from .layers import TorchConv, TorchDense, flatten_img, postprocess_probs, unflatten_img


def _resolve_noise(mod, family: str):
    """Build the module's NoiseModel; an explicit ``noise_intensity`` is
    held in the ``noise_cfg`` variables collection rather than baked into
    the compiled program — test-time intensity sweeps then swap/vmap the
    variable ({"noise_cfg": {"intensity": x}}) and compile ONE program per
    (model, channel kind) instead of one per intensity value (the
    reference's sweep rebuilds the QNode per intensity,
    src/mnist_noise.py:214-230, :441-444)."""
    if mod.add_noise == 0:
        return None
    intensity = mod.noise_intensity
    if intensity is not None:
        var = mod.variable(
            "noise_cfg", "intensity",
            lambda: jnp.asarray(float(intensity), jnp.float32))
        intensity = var.value
    return engine.noise_from_code(mod.add_noise, family, intensity)


def _traj_kwargs(mod, noise) -> dict:
    """Engine kwargs for the Monte-Carlo trajectory noise backend.

    ``noise_trajectories > 0`` estimates non-unitary channels with
    ``n_traj`` statevector trajectories instead of the density matrix
    (sim/trajectories.py) — the noisy route past ``density.MAX_DM_WIRES``.
    Callers must then provide a ``"trajectories"`` rng stream to
    ``apply`` (each engine call folds a fresh key)."""
    if mod.noise_trajectories and noise is not None and not noise.is_unitary:
        return {"n_traj": mod.noise_trajectories,
                "traj_key": mod.make_rng("trajectories")}
    return {}


class QDense(nn.Module):
    """Amplitude-embedded dense variational circuit (Qdense baseline).

    Reference: ``QDenseUndirected_old`` (nn/qdense.py:15-68) and its noise
    variant (:71-125). wires = ceil(log2(pixels)); probs readout scaled back
    to pixel space.
    """

    qdepth: int
    shape: Tuple[int, int]
    weight_map: str = "qw_tanh"   # _old uses qw_map.tanh; _noise uses torch.tanh
    add_noise: int = 0
    noise_intensity: Optional[float] = None
    noise_trajectories: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, height = self.shape
        pixels = width * height
        wires = max(1, math.ceil(math.log2(pixels)))
        w = self.param("qweights", qweight_init(), (self.qdepth, wires, 3))
        noise = _resolve_noise(self, "qdense")
        p = engine.qdense_circuit(
            flatten_img(x), w, wires=wires, pad_with=0.1,
            weight_map=self.weight_map, imprimitive="cnot", noise=noise,
            **_traj_kwargs(self, noise),
        )
        return unflatten_img(postprocess_probs(p, pixels), width, height)


class QNNA(nn.Module):
    """Angle(Y)-embedded circuit with a linear down-projection.

    Reference: ``QNN_A`` (nn/qdense.py:128-210): Linear(pixels->wires) ->
    AngleEmbedding-Y -> SEL (unmapped weights, CNOT ring) -> probs ->
    pixel-space post-processing.
    """

    qdepth: int
    shape: Tuple[int, int]
    add_noise: int = 0
    noise_intensity: Optional[float] = None
    noise_trajectories: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, height = self.shape
        pixels = width * height
        wires = max(1, math.ceil(math.log2(pixels)))
        h = TorchDense(wires, name="linear_down")(flatten_img(x))
        w = self.param("qweights", qweight_init(), (self.qdepth, wires, 3))
        noise = _resolve_noise(self, "qnn_a")
        p = engine.qnn_circuit(h, w, encode="ry", imprimitive="cnot",
                               noise=noise, readout="probs",
                               **_traj_kwargs(self, noise))
        return unflatten_img(postprocess_probs(p, pixels), width, height)


class QNNDense(nn.Module):
    """Linear sandwich around a single-encode CZ circuit.

    Reference: ``QNN`` / ``QNN_noise`` (nn/qdense.py:219-386). Note the
    reference circuit RZ-encodes the fresh |0..0> state, so its quantum
    output is input independent; reproduced faithfully by the engine.
    """

    input_dim: int
    hidden_features: int
    qdepth: int
    add_noise: int = 0
    noise_intensity: Optional[float] = None
    noise_trajectories: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, c, width, height = x.shape
        h = TorchDense(self.hidden_features, name="linear_down")(flatten_img(x))
        w = self.param("qweights", qweight_init(),
                       (self.qdepth, self.hidden_features, 3))
        noise = _resolve_noise(self, "qnn")
        q = engine.qnn_circuit(h, w, encode="rz", imprimitive="cz",
                               noise=noise, readout="expvalz",
                               **_traj_kwargs(self, noise))
        out = TorchDense(self.input_dim, name="linear_up")(q)
        return out.reshape(b, c, width, height)


class Reupload(nn.Module):
    """The QIDDM / differN data re-uploading family.

    N blocks of [L x (per-wire encode -> SEL(k, CZ))], wrapped in a
    configurable down/up projection (reference nn/qdense.py:389-2437; see
    SURVEY §2.2 for the class-by-class parameterization).

    down: 'linear' | 'pca' | 'conv' | 'none' | 'pca2_bn_linear'
    up:   'linear' | 'pca_inverse' | 'linear_then_pca_inverse' | 'none'
    """

    hidden: int                    # wires
    L: int                         # spectrum layers per block
    N: int                         # blocks
    input_dim: Optional[int] = None
    shape: Optional[Tuple[int, int]] = None
    k: int = 2                     # SEL layers per spectrum layer
    down: str = "linear"
    up: str = "linear"
    readout: str = "expvalz"       # 'expvalz' | 'probs'
    encode: str = "rz"             # 'rz' | 'ry' | 'rz_halfpi'
    shared_weights: bool = False   # QIDDM_A_sameN
    post_each_block: bool = False  # 'new' variants post-process per block
    batchnorm_pre_block: bool = False  # QIDDM_L_B
    bias: bool = True              # QIDDM_bias_false
    add_noise: int = 0
    noise_family: str = "qiddm"
    noise_intensity: Optional[float] = None
    noise_trajectories: int = 0
    pca_lazy: bool = False         # QIDDM_PP_old fits PCA once, lazily

    def _img_shape(self, x):
        if self.shape is not None:
            return self.shape
        return (x.shape[2], x.shape[3])

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        width, height = self._img_shape(x)
        pixels = width * height
        x_flat = flatten_img(x)
        noise = _resolve_noise(self, self.noise_family)

        pca_state = None
        # --- down-projection ------------------------------------------------
        if self.down == "linear":
            cur = TorchDense(self.hidden, use_bias=self.bias,
                             name="linear_down")(x_flat)
        elif self.down == "pca":
            if self.pca_lazy:
                pca_state = self._lazy_pca(x_flat, self.hidden)
                cur = pca_mod.pca_transform(pca_state, x_flat)
            else:
                # the reference re-fits PCA on every forward batch
                # (nn/qdense.py:456) — reproduced inside the jitted step.
                pca_state, cur = pca_mod.pca_fit_transform(x_flat, self.hidden)
        elif self.down == "conv":
            c = TorchConv(self.hidden, kernel_size=(3, 3), strides=(2, 2),
                          padding=(1, 1), name="conv_down")(x)
            cur = c.reshape(b, self.hidden, -1).mean(axis=2)
        elif self.down == "none":
            cur = x_flat
        elif self.down == "pca2_bn_linear":
            # QIDDM_PP_old (nn/qdense.py:1756-1844): lazy PCA(2h) -> BN -> Linear(h)
            pca_state = self._lazy_pca(x_flat, 2 * self.hidden)
            cur = pca_mod.pca_transform(pca_state, x_flat)
            cur = nn.BatchNorm(use_running_average=not train,
                               momentum=0.9, epsilon=1e-5,
                               name="pca_bn")(cur)
            cur = TorchDense(self.hidden, name="linear_down")(cur)
        else:
            raise ValueError(f"unknown down={self.down!r}")

        # --- quantum blocks -------------------------------------------------
        if self.shared_weights:
            w = self.param("qweights", qweight_init(),
                           (self.L, self.k, self.hidden, 3))
            blocks = [w] * self.N
        else:
            w = self.param("qweights", qweight_init(),
                           (self.N, self.L, self.k, self.hidden, 3))
            blocks = [w[n] for n in range(self.N)]

        if self.batchnorm_pre_block:
            # ONE BatchNorm shared across all N blocks (reference
            # nn/qdense.py:2088 reuses self.batchnorm in the loop)
            shared_bn = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5, name="bn")

        def _one_block(enc, w_n, traj_kw):
            out = engine.reupload_block(
                enc, w_n, encode=self.encode, imprimitive="cz",
                noise=noise, readout=self.readout, **traj_kw)
            if self.readout == "probs" and self.post_each_block:
                out = postprocess_probs(out, pixels)
            return out

        # The N blocks are structurally identical (same static config,
        # per-block weights): running them as ONE lax.scan body instead of
        # an unrolled Python loop keeps exactly one instance of the block
        # program (incl. its fused Pallas kernels) in the compiled
        # executable — the unrolled differN/QIDDM train step carried ~6 MB
        # of generated code PER BLOCK, which dominated cold-start program
        # load/compile walls (tools/bench_codegen_parts.py). BatchNorm
        # variants keep the unrolled loop: flax mutable batch stats cannot
        # update inside plain lax.scan.
        needs_traj = bool(self.noise_trajectories and noise is not None
                          and not noise.is_unitary)
        if self.N > 1 and not self.batchnorm_pre_block:
            stacked = (jnp.broadcast_to(w, (self.N,) + w.shape)
                       if self.shared_weights else w)
            # one fresh trajectory key per block, same make_rng fold order
            # as the unrolled loop (one call per block)
            tkeys = (jnp.stack([self.make_rng("trajectories")
                                for _ in range(self.N)])
                     if needs_traj else jnp.zeros((self.N, 2), jnp.uint32))

            def body(enc, xs):
                w_n, tkey = xs
                kw = ({"n_traj": self.noise_trajectories, "traj_key": tkey}
                      if needs_traj else {})
                out = _one_block(enc, w_n, kw)
                return out[:, : self.hidden], out

            enc0 = cur[:, : self.hidden]
            _, outs = jax.lax.scan(body, enc0, (stacked, tkeys))
            cur = outs[-1]
        else:
            for n in range(self.N):
                if self.batchnorm_pre_block:
                    cur = shared_bn(cur)
                kw = ({"n_traj": self.noise_trajectories,
                       "traj_key": self.make_rng("trajectories")}
                      if needs_traj else {})
                cur = _one_block(cur[:, : self.hidden], blocks[n], kw)

        # --- up-projection --------------------------------------------------
        if self.up == "none":
            out = cur if self.post_each_block else postprocess_probs(cur, pixels)
        elif self.up == "linear":
            out = TorchDense(self.input_dim or pixels, name="linear_up")(cur)
        elif self.up == "pca_inverse":
            out = pca_mod.pca_inverse_transform(pca_state, cur)
        elif self.up == "linear_then_pca_inverse":
            out = TorchDense(2 * self.hidden, name="linear_up")(cur)
            out = pca_mod.pca_inverse_transform(pca_state, out)
        else:
            raise ValueError(f"unknown up={self.up!r}")
        return unflatten_img(out, width, height)

    def _lazy_pca(self, x_flat, n_components: int) -> pca_mod.PCAState:
        """PCA fitted once on the first batch seen (during ``init``) and
        frozen afterwards (reference nn/qdense.py:1807-1810)."""
        is_init = self.is_mutable_collection("pca_state")
        if is_init and not self.has_variable("pca_state", "mean"):
            st = pca_mod.pca_fit(x_flat, n_components)
        else:
            st = None
        mean = self.variable("pca_state", "mean",
                             lambda: st.mean if st is not None else None)
        comps = self.variable("pca_state", "components",
                              lambda: st.components if st is not None else None)
        return pca_mod.PCAState(mean=mean.value, components=comps.value)
