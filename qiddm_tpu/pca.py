"""PCA in JAX with sklearn-compatible conventions.

Several reference models project images onto principal components before
quantum encoding (``sklearn.decomposition.PCA``, reference nn/qdense.py:403,
:1279, :1808-1810) — notably *re-fitting on every forward batch*
(nn/qdense.py:456). This module reproduces sklearn's ``fit_transform`` /
``transform`` / ``inverse_transform`` (including the ``svd_flip`` sign
convention) as pure jittable functions so the refit can live inside the
compiled train step. Gradients are stopped through the fit, matching the
reference's ``.detach().numpy()`` round-trip.

TPU note: implemented via ``eigh`` on the smaller Gram/covariance matrix
(SVD lowering on TPU is slower and less robust than eigh).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PCAState(NamedTuple):
    mean: jnp.ndarray        # (D,)
    components: jnp.ndarray  # (k, D)


def _svd_flip_signs(vt):
    """sklearn ``svd_flip(u, v, u_based_decision=False)`` (the convention
    PCA._fit_full uses since sklearn 1.5): sign of the max-|.|-entry of each
    row of Vt (i.e. of each principal component)."""
    idx = jnp.argmax(jnp.abs(vt), axis=1)
    vals = jnp.take_along_axis(vt, idx[:, None], axis=1)[:, 0]
    return jnp.where(vals >= 0, 1.0, -1.0).astype(vt.dtype)


def pca_fit(x, n_components: int) -> PCAState:
    """Fit PCA on ``x`` (B, D). Differentiation is stopped (parity with the
    reference's numpy round-trip)."""
    x = jax.lax.stop_gradient(x)
    b, d = x.shape
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    if b <= d:
        # Gram trick: eigh of (B, B). A rank-deficient batch (b < k, where
        # sklearn would refuse) yields zero-padded trailing components so
        # downstream shapes stay static.
        k_eff = min(n_components, b)
        gram = xc @ xc.T
        evals, evecs = jnp.linalg.eigh(gram)  # ascending
        order = jnp.argsort(-evals)[:k_eff]
        evals = jnp.maximum(evals[order], 0.0)
        u = evecs[:, order]  # (B, k_eff)
        s = jnp.sqrt(evals)
        # components = V^T rows = (X_c^T u / s)^T
        vt = ((xc.T @ u) / jnp.maximum(s[None, :], 1e-12)).T  # (k_eff, D)
        signs = _svd_flip_signs(vt)
        components = vt * signs[:, None]
        # Null-space eigenpairs (centering alone makes rank <= b-1; batches
        # with duplicated rows lose more) have s ~ 0 and their vt rows are
        # residual-noise / 1e-12 garbage of huge magnitude — zero them, the
        # same convention as the rank < n_components zero padding below.
        s_tol = jnp.max(s) * 1e-4 + 1e-12
        components = jnp.where((s > s_tol)[:, None], components, 0.0)
        if k_eff < n_components:
            components = jnp.concatenate(
                [components, jnp.zeros((n_components - k_eff, d),
                                       components.dtype)], axis=0)
    else:
        cov = xc.T @ xc
        evals, evecs = jnp.linalg.eigh(cov)
        order = jnp.argsort(-evals)[:n_components]
        v = evecs[:, order]  # (D, k)
        vt = v.T
        signs = _svd_flip_signs(vt)
        components = vt * signs[:, None]
    return PCAState(mean=mean, components=components)


def pca_transform(state: PCAState, x):
    return (x - state.mean[None, :]) @ state.components.T


def pca_inverse_transform(state: PCAState, y):
    return y @ state.components + state.mean[None, :]


def pca_fit_transform(x, n_components: int):
    state = pca_fit(x, n_components)
    return state, pca_transform(state, x)
