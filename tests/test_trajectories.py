"""Monte-Carlo trajectory noise backend vs the exact density-matrix backend.

The trajectory estimator is unbiased; with n_traj trajectories the per-entry
std is ~sqrt(p(1-p)/n_traj) <= 0.5/sqrt(n_traj). Tests compare means against
dm exact values with ~5 sigma tolerances (deterministic keys — no flakes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qiddm_tpu import sim
from qiddm_tpu.sim import density as dm
from qiddm_tpu.sim import trajectories as traj
from qiddm_tpu.sim.engine import NoiseModel

RNG = np.random.default_rng(11)


def _setup(b=3, w=3, L=2, k=2):
    x = jnp.asarray(RNG.normal(size=(b, w)), jnp.float32)
    wq = jnp.asarray(RNG.normal(size=(L, k, w, 3)) * 0.4, jnp.float32)
    return x, wq


def _tol(n_traj):
    return 5 * 0.5 / np.sqrt(n_traj)


@pytest.mark.parametrize("kind,strength", [
    ("phase_damping", 0.25),
    ("depolarizing", 0.2),
    ("amplitude_damping", 0.3),
])
def test_single_channel_matches_dm(kind, strength):
    """One channel application on a random state: trajectory mean of probs
    == dm probs within MC error."""
    w, b, n_traj = 3, 2, 4000
    st = jnp.asarray(RNG.normal(size=(b, 2**w)) +
                     1j * RNG.normal(size=(b, 2**w)), jnp.complex64)
    st = st / jnp.linalg.norm(st, axis=1, keepdims=True)

    rho = dm.from_statevector(st)
    rho = dm.apply_channel_all_wires(rho, kind, strength)
    want = np.asarray(dm.probs(rho))

    stT = jnp.tile(st, (n_traj, 1))
    out = jax.jit(lambda s, key: traj.apply_channel_trajectory(
        s, kind, strength, key))(stT, jax.random.PRNGKey(0))
    got = np.asarray(traj._mean_over_traj(sim.probs(out), n_traj))
    np.testing.assert_allclose(got, want, atol=_tol(n_traj))
    # norms stay exactly 1 per trajectory (unitary mixtures / renormalized
    # Kraus branches)
    norms = np.asarray(jnp.sum(sim.probs(out), axis=1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_strength_zero_is_exact():
    """At strength 0 every branch is the identity: trajectory == clean,
    exactly, for any n_traj."""
    x, wq = _setup()
    noise = NoiseModel("amplitude_damping", 0.0, "encode")
    clean = sim.reupload_block(x, wq, encode="rz", imprimitive="cz",
                               readout="probs")
    got = sim.reupload_block_trajectories(
        x, wq, key=jax.random.PRNGKey(1), n_traj=3, noise=noise,
        encode="rz", imprimitive="cz", readout="probs")
    np.testing.assert_allclose(np.asarray(got), np.asarray(clean), atol=2e-6)


@pytest.mark.parametrize("kind,strength,readout", [
    ("phase_damping", 0.3, "probs"),
    ("depolarizing", 0.15, "expvalz"),
    ("amplitude_damping", 0.2, "probs"),
])
def test_reupload_block_matches_dm(kind, strength, readout):
    x, wq = _setup()
    noise = NoiseModel(kind, strength, "encode")
    want = np.asarray(sim.reupload_block(
        x, wq, encode="rz", imprimitive="cz", noise=noise, readout=readout))
    n_traj = 4000
    got = np.asarray(jax.jit(
        lambda x, wq, key: sim.reupload_block_trajectories(
            x, wq, key=key, n_traj=n_traj, noise=noise, encode="rz",
            imprimitive="cz", readout=readout)
    )(x, wq, jax.random.PRNGKey(2)))
    # expval entries are in [-1, 1]: twice the probs half-width
    scale = 2.0 if readout == "expvalz" else 1.0
    np.testing.assert_allclose(got, want, atol=scale * _tol(n_traj))


def test_engine_routes_n_traj():
    """engine.reupload_block(n_traj=...) takes the trajectory backend and
    matches an explicit trajectories call bit-for-bit."""
    x, wq = _setup()
    noise = NoiseModel("depolarizing", 0.1, "encode")
    key = jax.random.PRNGKey(3)
    a = sim.reupload_block(x, wq, encode="rz", imprimitive="cz",
                           noise=noise, readout="probs", n_traj=64,
                           traj_key=key)
    b = sim.reupload_block_trajectories(
        x, wq, key=key, n_traj=64, noise=noise, encode="rz",
        imprimitive="cz", readout="probs")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qdense_trajectories_matches_dm():
    w, depth, b, n_traj = 3, 4, 2, 3000
    x = jnp.asarray(RNG.uniform(size=(b, 2**w)), jnp.float32)
    wq = jnp.asarray(RNG.normal(size=(depth, w, 3)) * 0.4, jnp.float32)
    noise = NoiseModel("amplitude_damping", 0.1, "end")
    want = np.asarray(sim.qdense_circuit(x, wq, wires=w, noise=noise))
    got = np.asarray(sim.qdense_circuit(
        x, wq, wires=w, noise=noise, n_traj=n_traj,
        traj_key=jax.random.PRNGKey(4)))
    np.testing.assert_allclose(got, want, atol=_tol(n_traj))


def test_qnn_trajectories_matches_dm():
    w, depth, b, n_traj = 3, 3, 2, 3000
    x = jnp.asarray(RNG.normal(size=(b, w)), jnp.float32)
    wq = jnp.asarray(RNG.normal(size=(depth, w, 3)) * 0.4, jnp.float32)
    noise = NoiseModel("phase_damping", 0.2, "encode")
    want = np.asarray(sim.qnn_circuit(x, wq, encode="ry",
                                      imprimitive="cnot", noise=noise,
                                      readout="expvalz"))
    got = np.asarray(sim.qnn_circuit(
        x, wq, encode="ry", imprimitive="cnot", noise=noise,
        readout="expvalz", n_traj=n_traj, traj_key=jax.random.PRNGKey(5)))
    np.testing.assert_allclose(got, want, atol=2 * _tol(n_traj))


def test_traced_strength_sweeps_in_one_program():
    """Strength stays traceable: vmap over intensities compiles and matches
    per-intensity scalar runs."""
    x, wq = _setup(b=2, w=3, L=2, k=1)
    key = jax.random.PRNGKey(6)

    def run(s):
        noise = NoiseModel("depolarizing", s, "encode")
        return sim.reupload_block_trajectories(
            x, wq, key=key, n_traj=32, noise=noise, encode="rz",
            imprimitive="cz", readout="probs")

    ss = jnp.asarray([0.0, 0.1, 0.3], jnp.float32)
    sweeped = jax.jit(jax.vmap(run))(ss)
    for i, s in enumerate(ss):
        one = run(s)
        np.testing.assert_allclose(np.asarray(sweeped[i]), np.asarray(one),
                                   atol=3e-6)


def test_wide_noisy_circuit_beyond_dm_cap():
    """13 wires: the dm backend refuses (MAX_DM_WIRES = 12) but the
    trajectory backend runs — the capability the reference (and our dm
    path) cannot reach."""
    w = 13
    x = jnp.asarray(RNG.normal(size=(2, w)), jnp.float32)
    wq = jnp.asarray(RNG.normal(size=(1, 1, w, 3)) * 0.4, jnp.float32)
    noise = NoiseModel("amplitude_damping", 0.05, "encode")
    with pytest.raises(ValueError, match="capped"):
        sim.reupload_block(x, wq, noise=noise, readout="expvalz")
    out = sim.reupload_block(x, wq, noise=noise, readout="expvalz",
                             n_traj=8, traj_key=jax.random.PRNGKey(7))
    assert out.shape == (2, w)
    assert np.all(np.isfinite(np.asarray(out)))


def test_model_and_diffusion_trajectory_sampling():
    """End-to-end: a noisy zoo model with noise_trajectories sampling
    through Diffusion (the *_noise drivers' test path on the trajectory
    backend), statistically consistent with the exact dm sampler."""
    from qiddm_tpu import nn as qnn
    from qiddm_tpu.cli.common import with_noise
    from qiddm_tpu.diffusion import Diffusion

    net = qnn.QIDDM_LL_noise(64, 4, 2, 1, 0)
    first_x = jnp.asarray(RNG.uniform(size=(2, 1, 8, 8)), jnp.float32)

    dm_net = with_noise(net, 2, 0.05)
    dm_diff = Diffusion(net=dm_net, prediction_goal="data", shape=(8, 8))
    want = np.asarray(dm_diff.sample(first_x=first_x, n_iters=3,
                                     only_last=True))

    tr_net = with_noise(net, 2, 0.05, noise_trajectories=600)
    tr_diff = Diffusion(net=tr_net, prediction_goal="data", shape=(8, 8))
    got = np.asarray(tr_diff.sample(first_x=first_x, n_iters=3,
                                    only_last=True,
                                    traj_rng=jax.random.PRNGKey(8)))
    assert got.shape == want.shape
    # iterated denoising compounds the MC error through the linear head;
    # bound loosely — the pin is consistency, not exactness
    assert np.mean(np.abs(got - want)) < 0.08
    # deterministic given the rng
    again = np.asarray(tr_diff.sample(first_x=first_x, n_iters=3,
                                      only_last=True,
                                      traj_rng=jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(got, again)


def test_missing_rng_stream_raises():
    """noise_trajectories without a 'trajectories' rng stream is a loud
    flax error, not silent dm fallback."""
    from qiddm_tpu import nn as qnn
    from qiddm_tpu.cli.common import with_noise

    net = with_noise(qnn.QIDDM_LL_noise(64, 4, 2, 1, 0), 2, 0.05,
                     noise_trajectories=8)
    x = jnp.zeros((1, 1, 8, 8), jnp.float32)
    with pytest.raises(Exception, match="[Rr]ng|trajectories"):
        net.module.apply(net.variables, x, train=False, mutable=False)


@pytest.mark.parametrize("kind,strength", [
    ("depolarizing", 0.15),
    ("amplitude_damping", 0.2),
    ("phase_damping", 0.3),
])
def test_sharded_trajectories_match_dense(kind, strength):
    """The mesh-sharded trajectory program draws the SAME branches per key
    as the dense backend (sampling structures mirror each other), so their
    estimates agree to float tolerance — noise now rides the mesh."""
    from qiddm_tpu.parallel import make_mesh

    mesh = make_mesh(8, ("data",))
    x, wq = _setup(b=2, w=5, L=2, k=2)
    noise = NoiseModel(kind, strength, "encode")
    key = jax.random.PRNGKey(9)
    n_traj = 64
    dense = sim.reupload_block_trajectories(
        x, wq, key=key, n_traj=n_traj, noise=noise, encode="rz",
        imprimitive="cz", readout="expvalz")
    sharded = sim.reupload_block(
        x, wq, encode="rz", imprimitive="cz", noise=noise,
        readout="expvalz", mesh=mesh, n_traj=n_traj, traj_key=key)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=1e-4)


def test_sharded_noise_without_traj_still_raises():
    from qiddm_tpu.parallel import make_mesh

    mesh = make_mesh(8, ("data",))
    x, wq = _setup(b=2, w=5)
    noise = NoiseModel("depolarizing", 0.1, "encode")
    with pytest.raises(NotImplementedError, match="trajectory"):
        sim.reupload_block(x, wq, noise=noise, readout="expvalz", mesh=mesh)


def test_noise_driver_traj_backend(tmp_path, monkeypatch):
    """--noise-backend traj runs the full noise-sweep driver on the
    trajectory backend, writes distinct (_traj) sampler caches, and at
    intensity 0 matches the exact backend's scores."""
    from qiddm_tpu.cli import mnist_noise
    from qiddm_tpu.cli.noise_common import run_noise_sweep

    monkeypatch.chdir(tmp_path)
    argv = [
        "--data", "mnist_8x8", "--img_size", "8",
        "--model", "QIDDM_LL_noise", "64", "4", "2", "1",
        "--ds-size", "120", "--epochs", "1", "--batch_size", "8",
        "--tau", "2", "--label", "3",
        "--save-path", str(tmp_path) + "/t_",
        "--load-path", str(tmp_path) + "/t_",
    ]
    args_dm = mnist_noise.parse_args(argv)
    res_dm = run_noise_sweep(args_dm, noise_types=[2],
                             intensities=[0.0, 0.05], tau_test=2)
    args_tr = mnist_noise.parse_args(
        argv + ["--noise-backend", "traj", "--n-traj", "64"])
    res_tr = run_noise_sweep(args_tr, noise_types=[2],
                             intensities=[0.0, 0.05], tau_test=2)
    import pathlib
    assert list(pathlib.Path(tmp_path).rglob("*_outp_*_traj.pt"))
    dm0 = res_dm["QIDDM_LL_noise"][2]["ssim"][0]
    tr0 = res_tr["QIDDM_LL_noise"][2]["ssim"][0]
    # intensity 0: every trajectory branch is the identity — exact match
    np.testing.assert_allclose(tr0, dm0, atol=1e-4)
    assert np.all(np.isfinite(res_tr["QIDDM_LL_noise"][2]["ssim"]))


def test_end_placement_matches_dm():
    """placement='end' (Qdense/QNN_A-style: channel once after the block)
    is honored by the trajectory backend — dense and sharded — and
    converges to the dm path (which applies it once after the scan)."""
    from qiddm_tpu.parallel import make_mesh

    x, wq = _setup(b=2, w=3, L=2, k=2)
    noise = NoiseModel("amplitude_damping", 0.3, "end")
    want = np.asarray(sim.reupload_block(
        x, wq, encode="rz", imprimitive="cz", noise=noise,
        readout="probs"))
    n_traj = 4000
    key = jax.random.PRNGKey(13)
    got = np.asarray(sim.reupload_block_trajectories(
        x, wq, key=key, n_traj=n_traj, noise=noise, encode="rz",
        imprimitive="cz", readout="probs"))
    np.testing.assert_allclose(got, want, atol=_tol(n_traj))

    # sharded honors it identically (same key -> same branch draws); 5
    # wires so the 8-device mesh keeps local wires (3 shard bits)
    mesh = make_mesh(8, ("data",))
    x5, wq5 = _setup(b=2, w=5, L=2, k=2)
    small = sim.reupload_block_trajectories(
        x5, wq5, key=key, n_traj=64, noise=noise, encode="rz",
        imprimitive="cz", readout="probs")
    sharded = sim.reupload_block(
        x5, wq5, encode="rz", imprimitive="cz", noise=noise,
        readout="probs", mesh=mesh, n_traj=64, traj_key=key)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(small),
                               atol=1e-4)


def test_sharded_noise_guard_rejects_missing_traj_args():
    from qiddm_tpu.parallel import make_mesh
    from qiddm_tpu.sim.sharded import reupload_block_sharded

    mesh = make_mesh(8, ("data",))
    x, wq = _setup(b=2, w=5)
    with pytest.raises(ValueError, match="n_traj"):
        reupload_block_sharded(x, wq, mesh, noise_kind="depolarizing",
                               noise_strength=0.1)


def test_dense_trajectory_missing_key_raises():
    """key=None must fail with guidance, not a TypeError deep in
    jax.random.split (parity with the sharded route's guard)."""
    from qiddm_tpu.sim import engine as eng
    from qiddm_tpu.sim.engine import NoiseModel

    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 3)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(2, 2, 3, 3)) * 0.4,
                    jnp.float32)
    nm = NoiseModel("depolarizing", 0.05, "encode")
    with pytest.raises(ValueError, match="traj_key"):
        eng.reupload_block(x, w, noise=nm, n_traj=8, traj_key=None)
    xa = jnp.asarray(np.random.default_rng(2).uniform(size=(2, 8)),
                     jnp.float32)
    wq = jnp.asarray(np.random.default_rng(3).normal(size=(4, 3, 3)) * 0.4,
                     jnp.float32)
    with pytest.raises(ValueError, match="traj_key"):
        eng.qdense_circuit(xa, wq, wires=3, noise=NoiseModel(
            "amplitude_damping", 0.1, "end"), n_traj=8, traj_key=None)


def test_phase_damping_fused_pass_equals_gate_loop():
    """The single-sign-plane phase-damping pass is BIT-IDENTICAL to the
    per-wire sampled-Pauli gate loop it replaced: same categorical draws
    from the same key, exact +-1 arithmetic."""
    from qiddm_tpu.sim.statevector import apply_1q
    from qiddm_tpu.sim.trajectories import _pauli_mixture

    b, w, strength = 6, 5, 0.3
    st = RNG.normal(size=(b, 2**w)) + 1j * RNG.normal(size=(b, 2**w))
    st = jnp.asarray(st / np.linalg.norm(st, axis=1, keepdims=True),
                     jnp.complex64)
    key = jax.random.PRNGKey(123)

    got = traj.apply_channel_trajectory(st, "phase_damping", strength, key)

    # the pre-fusion reference implementation, same draw layout
    p, mats = _pauli_mixture("phase_damping", strength)
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(p, 1e-30)), shape=(w, b))
    want = st
    for j in range(w):
        want = apply_1q(want, jnp.asarray(mats, jnp.complex64)[idx[j]], j, w)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_traj_kernel_route_guards():
    """The tiled-kernel SEL route engages only on TPU within the traj
    cap, never under an outer vmap, and is off on CPU (where these tests
    run) — the routing helper itself is checked directly. use_pallas is
    pinned True for the duration: the route also reads that mutable
    global, and an earlier test flipping it would otherwise make these
    assertions order-dependent."""
    from qiddm_tpu import config
    from qiddm_tpu.sim.trajectories import _kernel_route

    st = jnp.zeros((4, 2**11), jnp.complex64)
    wq = jnp.zeros((2, 11, 3), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    prior = config.use_pallas()
    config.set_use_pallas(True)
    try:
        assert _kernel_route(11, jnp.complex64, st, wq) == on_tpu
        # above the trajectory cap: never
        assert not _kernel_route(config.traj_pallas_max_wires() + 1,
                                 jnp.complex64, st, wq)
        # wrong dtype: never
        assert not _kernel_route(11, jnp.complex128, st, wq)
        # pallas disabled: never
        config.set_use_pallas(False)
        assert not _kernel_route(11, jnp.complex64, st, wq)
    finally:
        config.set_use_pallas(prior)


@pytest.mark.parametrize("w,b", [(4, 3), (8, 4), (10, 130)])
def test_amp_damp_fused_interpret_matches_xla(w, b):
    """Interpret-mode parity of the fused amplitude-damping kernel vs its
    XLA twin (same presampled uniforms -> identical branch picks), incl.
    a batch above the tile size so the pad/chunk path is exercised, plus
    gradient agreement through the custom VJP (ADVICE r3 #1)."""
    from qiddm_tpu.sim.trajectories import _amp_damp_fused, _amp_damp_xla

    tile = 64
    rng = np.random.default_rng(20 + w)
    st = rng.normal(size=(b, 2**w)) + 1j * rng.normal(size=(b, 2**w))
    st = jnp.asarray(st / np.linalg.norm(st, axis=1, keepdims=True),
                     jnp.complex64)
    u = jnp.asarray(rng.uniform(size=(w, b)), jnp.float32)
    g = jnp.float32(0.3)

    want = _amp_damp_xla(st, u, g)
    got = _amp_damp_fused(st, u, g, tile, True)  # interpret=True
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)

    # gradients: the fused custom VJP replays the XLA twin with the same
    # uniforms — grads w.r.t. the input state and the strength must match
    wgt = jnp.arange(2**w) / 2**w  # O(1) weights: fp32 rounding stays tiny

    def loss_fused(s, gg):
        return jnp.sum(jnp.abs(_amp_damp_fused(s, u, gg, tile, True)) ** 2
                       * wgt)

    def loss_xla(s, gg):
        return jnp.sum(jnp.abs(_amp_damp_xla(s, u, gg)) ** 2 * wgt)

    gf_s, gf_g = jax.grad(loss_fused, argnums=(0, 1))(st, g)
    gx_s, gx_g = jax.grad(loss_xla, argnums=(0, 1))(st, g)
    np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gx_s),
                               atol=5e-6)
    np.testing.assert_allclose(float(gf_g), float(gx_g), rtol=2e-4)
