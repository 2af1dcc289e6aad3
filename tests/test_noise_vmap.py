"""Traced channel strength: intensity sweeps compile ONE program per
(model, channel kind) and vmap over the intensity axis (VERDICT r2 item 2).

Reference contrast: src/mnist_noise.py:214-230 rebuilds the QNode (a fresh
compiled program) for every intensity in the sweep (:441-444).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import nn
from qiddm_tpu.cli import common
from qiddm_tpu.sim import channels as ch
from qiddm_tpu.sim import density as dm


def _x(n=3, s=8):
    return jnp.asarray(np.random.default_rng(0).uniform(size=(n, 1, s, s)),
                       jnp.float32)


@pytest.mark.parametrize("code", [1, 2, 3, 4])
def test_intensity_is_traced_one_compile(code):
    """Two different intensities through one jitted program: a single cache
    entry, and each output equals the per-float (recompiling) path."""
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
    x = _x()
    noisy = common.with_noise(net, code, 0.05)
    assert "noise_cfg" in noisy.variables
    mod = noisy.module
    base = {k: v for k, v in noisy.variables.items() if k != "noise_cfg"}

    @jax.jit
    def f(intensity):
        v = {**base, "noise_cfg": {"intensity": intensity}}
        return mod.apply(v, x, train=False)

    o_lo = np.asarray(f(jnp.float32(0.05)))
    o_hi = np.asarray(f(jnp.float32(0.4)))
    assert f._cache_size() == 1
    ref_hi = np.asarray(common.with_noise(net, code, 0.4)(x))
    np.testing.assert_allclose(o_hi, ref_hi, atol=1e-6)
    # the channel must actually act (0.05 vs 0.4 differ)
    assert not np.allclose(o_lo, o_hi)


def test_intensity_vmap_matches_scalar_path():
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
    x = _x()
    noisy = common.with_noise(net, 2, 0.0)
    mod = noisy.module
    base = {k: v for k, v in noisy.variables.items() if k != "noise_cfg"}
    ints = jnp.asarray([0.0, 0.1, 0.5], jnp.float32)

    def one(i):
        return mod.apply({**base, "noise_cfg": {"intensity": i}}, x,
                         train=False)

    out = np.asarray(jax.jit(jax.vmap(one))(ints))
    for i, v in enumerate([0.0, 0.1, 0.5]):
        want = np.asarray(common.with_noise(net, 2, v)(x))
        np.testing.assert_allclose(out[i], want, atol=1e-6)


def test_noise_sweep_uses_vmapped_sampler(tmp_path, monkeypatch):
    """run_noise_sweep's missing-cache intensities go through ONE vmapped
    sampler call per (model, noise type), and the scores equal a rerun
    that reloads everything from the per-intensity caches."""
    from qiddm_tpu.cli import mnist_noise, noise_common

    calls = []
    orig = noise_common._sample_intensities

    def spy(diff, first_x, tau_test, intensities, **kw):
        calls.append(list(intensities))
        return orig(diff, first_x, tau_test, intensities, **kw)

    monkeypatch.setattr(noise_common, "_sample_intensities", spy)
    monkeypatch.chdir(tmp_path)
    args = mnist_noise.parse_args([
        "--model", "QIDDM_LL_noise", "64", "3", "1", "1",
        "--data", "mnist_8x8", "--img_size", "8", "--label", "1",
        "--epochs", "1", "--ds-size", "40", "--tau", "2",
        "--save-path", str(tmp_path) + "/", "--load-path",
        str(tmp_path) + "/"])
    res = noise_common.run_noise_sweep(
        args, noise_types=[2], intensities=[0.0, 0.1, 0.3], tau_test=3)
    assert calls == [[0.0, 0.1, 0.3]]  # one vmapped call for all three
    curve = res["QIDDM_LL_noise"][2]["ssim"]
    assert len(curve) == 3 and np.all(np.isfinite(curve))

    # second run: all three intensities come from the caches, same scores
    calls.clear()
    args2 = mnist_noise.parse_args([
        "--model", "QIDDM_LL_noise", "64", "3", "1", "1",
        "--data", "mnist_8x8", "--img_size", "8", "--label", "1",
        "--epochs", "1", "--ds-size", "40", "--tau", "2",
        "--save-path", str(tmp_path) + "/", "--load-path",
        str(tmp_path) + "/"])
    res2 = noise_common.run_noise_sweep(
        args2, noise_types=[2], intensities=[0.0, 0.1, 0.3], tau_test=3)
    assert calls == []  # nothing re-sampled
    np.testing.assert_allclose(res2["QIDDM_LL_noise"][2]["ssim"], curve,
                               atol=1e-6)


@pytest.mark.parametrize("kind", ["phase_damping", "amplitude_damping",
                                  "depolarizing", "phase_shift"])
def test_kraus_builders_traced_match_static(kind):
    """kraus_for with a traced strength equals the float path."""
    want = [np.asarray(k) for k in ch.kraus_for(kind, 0.3)]

    got = jax.jit(lambda s: jnp.stack(
        [jnp.asarray(k) for k in ch.kraus_for(kind, s)]))(jnp.float64(0.3)
    if jax.config.jax_enable_x64 else jnp.float32(0.3))
    for w, g in zip(want, np.asarray(got)):
        np.testing.assert_allclose(g, w, atol=1e-6)


@pytest.mark.parametrize("kind", ["phase_damping", "amplitude_damping",
                                  "depolarizing"])
def test_closed_form_channels_traced(kind):
    rng = np.random.default_rng(1)
    v = rng.normal(size=(2, 16)) + 1j * rng.normal(size=(2, 16))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rho = jnp.asarray(v[:, :, None] * v[:, None, :].conj(), jnp.complex64)
    want = np.asarray(dm.apply_channel_all_wires(rho, kind, 0.23))
    got = np.asarray(jax.jit(
        lambda s: dm.apply_channel_all_wires(rho, kind, s))(
            jnp.float32(0.23)))
    np.testing.assert_allclose(got, want, atol=1e-6)
