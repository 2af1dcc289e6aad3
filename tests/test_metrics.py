"""Metric tests: SSIM/PSNR against an independent numpy implementation of the
skimage algorithm, cosine/FID against direct formulas."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import uniform_filter

from qiddm_tpu import metrics

RNG = np.random.default_rng(7)


def ssim_numpy(im1, im2, data_range):
    """Independent re-implementation of skimage.structural_similarity with
    defaults (win_size=7, uniform windows, K1=.01, K2=.03, unbiased cov)."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = 49.0
    cov_norm = NP / (NP - 1)
    f = lambda a: uniform_filter(a, size=7)
    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / \
        ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    pad = 3
    return S[pad:-pad, pad:-pad].mean()


def test_ssim_identity():
    im = RNG.uniform(size=(28, 28))
    v = float(metrics.ssim_pair(jnp.asarray(im), jnp.asarray(im),
                                im.max() - im.min()))
    assert abs(v - 1.0) < 1e-5


def test_ssim_matches_independent_numpy():
    for _ in range(3):
        a = RNG.uniform(size=(28, 28))
        b = np.clip(a + 0.3 * RNG.normal(size=(28, 28)), 0, 1)
        dr = a.max() - a.min()
        got = float(metrics.ssim_pair(jnp.asarray(a), jnp.asarray(b), dr))
        want = ssim_numpy(a, b, dr)
        assert abs(got - want) < 1e-4, (got, want)


def test_ssim_iterations_shape_and_ordering():
    clean = np.tile(RNG.uniform(size=(28, 28)), (5, 1, 1))[:, None]
    gen = np.stack([
        np.clip(clean[:, 0] + s * RNG.normal(size=(5, 28, 28)), 0, 1)
        for s in (0.5, 0.2, 0.05)
    ])[:, :, None]
    vals = metrics.ssim_iterations(gen, clean)
    assert vals.shape == (3,)
    assert vals[0] < vals[1] < vals[2]  # less noise -> higher SSIM


def test_psnr_formula():
    a = RNG.uniform(size=(16, 16))
    b = np.clip(a + 0.1, 0, 1)
    dr = b.max() - b.min()
    got = float(metrics.psnr_pair(jnp.asarray(a), jnp.asarray(b), dr))
    want = 10 * np.log10(dr**2 / np.mean((a - b) ** 2))
    assert abs(got - want) < 1e-3


def test_cosine_maps_to_unit_interval():
    gen = np.abs(RNG.uniform(size=(2, 3, 1, 8, 8)))
    real = np.abs(RNG.uniform(size=(4, 1, 8, 8)))
    vals = metrics.cosine_iterations(gen, real)
    assert vals.shape == (2,)
    assert np.all(vals >= 0) and np.all(vals <= 1)
    # identical images -> exactly 1
    same = metrics.cosine_iterations(
        np.tile(real[0][None, None], (1, 1, 1, 1, 1)), real[:1])
    np.testing.assert_allclose(same, 1.0, atol=1e-6)


def test_fid_zero_for_identical_sets():
    x = RNG.uniform(size=(20, 1, 8, 8))
    v = metrics.calculate_fid(x, x, 20, 20)
    assert abs(v) < 1e-6
    y = x + 1.0
    v2 = metrics.calculate_fid(x, y, 20, 20)
    assert v2 > 50  # mean shift of 1 across 64 pixels


def test_map_model_name():
    assert metrics.map_model_name("differN_noise") == "QIDDMA"
    assert metrics.map_model_name("QDenseUndirected_old_noise") == "Qdense"
    assert metrics.map_model_name("differN_new_pca=9_N=2") == "QIDDMA"
    assert metrics.map_model_name("unet_undirected_d3_s8_d0") == "U-net"
    assert metrics.map_model_name("somethingelse") == "somethingelse"
