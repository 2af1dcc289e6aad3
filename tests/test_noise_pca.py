"""Golden tests for the forward-noising schedules and the PCA port."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.decomposition import PCA as SkPCA

from qiddm_tpu import noise, pca

RNG = np.random.default_rng(1)


def test_add_normal_noise_multiple_semantics():
    key = jax.random.PRNGKey(0)
    batch, pixels, tau = 3, 16, 5
    data = jnp.asarray(RNG.uniform(size=(batch, pixels)), jnp.float32)
    out = noise.add_normal_noise_multiple(key, data, tau, decay_mod=3.0)
    assert out.shape == (batch * tau, pixels)
    out = np.asarray(out).reshape(batch, tau, pixels)
    # row 0 of each image chain is the clean image (weight 0)
    np.testing.assert_allclose(out[:, 0], np.asarray(data), atol=1e-6)
    # everything clipped
    assert out.min() >= 0.0 and out.max() <= 1.0
    # the same noise image is used for every tau step: recover it from two
    # steps and check a third
    w = np.linspace(0, 1, tau) ** 3.0
    w = w / w.max()
    n_est = (out[:, -1] - np.asarray(data) * (1 - w[-1])) / w[-1]
    mid = 2
    expect = np.clip(np.asarray(data) * (1 - w[mid]) + n_est * w[mid], 0, 1)
    np.testing.assert_allclose(out[:, mid], expect, atol=1e-4)


def test_add_uniform_noise_multiple_no_clip():
    key = jax.random.PRNGKey(1)
    data = jnp.asarray(RNG.uniform(size=(2, 8)), jnp.float32)
    out = np.asarray(noise.add_uniform_noise_multiple(key, data, 4, 2.0))
    assert out.shape == (8, 8)
    np.testing.assert_allclose(out.reshape(2, 4, 8)[:, 0], np.asarray(data), atol=1e-6)


def test_iterative_schedules_shapes_and_first_row():
    key = jax.random.PRNGKey(2)
    data = jnp.asarray(RNG.uniform(size=(2, 8)), jnp.float32)
    for fn, kw in [
        (noise.add_uniform_noise_iteratively, dict(decay_mod=1.0)),
        (noise.add_noise_normal_iteratively, dict(decay_mod=0.4)),
    ]:
        out = np.asarray(fn(key, data, 5, **kw)).reshape(2, 5, 8)
        np.testing.assert_allclose(out[:, 0], np.asarray(data), atol=1e-6)
        # later steps are noisier on average
        d1 = np.abs(out[:, 1] - out[:, 0]).mean()
        d4 = np.abs(out[:, 4] - out[:, 0]).mean()
        assert d4 > d1


def test_normalize_mean():
    data = jnp.asarray(RNG.uniform(size=(2, 8)) + 0.5, jnp.float32)
    inp = jnp.asarray(RNG.uniform(size=(2 * 3, 8)) + 0.1, jnp.float32)
    out = np.asarray(noise.normalize_mean(data, inp)).reshape(2, 3, 8)
    want_means = np.asarray(data).mean(axis=1)
    got_means = out.mean(axis=2)  # (batch, tau)
    for b in range(2):
        np.testing.assert_allclose(got_means[b], want_means[b], rtol=1e-5)


@pytest.mark.parametrize("b,d,k", [(11, 64, 6), (40, 784, 10), (100, 16, 4)])
def test_pca_matches_sklearn(b, d, k):
    x = RNG.normal(size=(b, d))
    sk = SkPCA(n_components=k, svd_solver="full")
    want = sk.fit_transform(x)
    # NOTE: tests run without jax_enable_x64, so this exercises the float32
    # path; tolerances reflect fp32 eigh precision (signs must match exactly).
    state, got = pca.pca_fit_transform(jnp.asarray(x, jnp.float32), k)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)
    np.testing.assert_allclose(np.asarray(state.components), sk.components_, atol=1e-3)
    # transform path
    got_t = pca.pca_transform(state, jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(got_t), want, atol=5e-3)
    # inverse path
    inv = pca.pca_inverse_transform(state, got)
    want_inv = sk.inverse_transform(want)
    np.testing.assert_allclose(np.asarray(inv), want_inv, atol=5e-3)


def test_pca_float32_reasonable():
    x = RNG.normal(size=(40, 784))
    sk = SkPCA(n_components=10, svd_solver="full")
    want = sk.fit_transform(x)
    _, got = pca.pca_fit_transform(jnp.asarray(x, jnp.float32), 10)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2)
