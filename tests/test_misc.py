"""x64 parity mode, UNet/BatchNorm training path, checkpoint roundtrip,
logger reconstruction."""

import os
import pathlib
import subprocess
import sys

import jax
import numpy as np
import pytest

from qiddm_tpu import data, nn
from qiddm_tpu.ckpt import load_diffusion, save_diffusion
from qiddm_tpu.diffusion import Diffusion
from qiddm_tpu.train import train_diffusion


def test_x64_parity_mode_subprocess():
    """enable_x64 gives complex128 statevectors and 1e-12 normalization
    (run in a subprocess: the flag must be set before JAX array creation)."""
    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, %r)
from qiddm_tpu import config
config.enable_x64()
import jax.numpy as jnp, numpy as np
from qiddm_tpu import sim
x = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 60)), jnp.float64)
w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 6, 3)) * 0.4)
p = sim.qdense_circuit(x, w, wires=6, cdtype=jnp.complex128)
assert p.dtype == jnp.float64, p.dtype
err = float(jnp.abs(p.sum(1) - 1.0).max())
assert err < 1e-12, err
print("X64_OK", err)
"""
    repo = str(pathlib.Path(__file__).parent.parent)
    out = subprocess.run([sys.executable, "-c", code % repo],
                         capture_output=True, text=True, timeout=300)
    assert "X64_OK" in out.stdout, out.stderr[-2000:]


@pytest.mark.slow
def test_unet_diffusion_training_with_batchstats():
    """Classical UNet (the reference's U-net baseline) through the full
    jitted training scan — exercises mutable batch_stats threading."""
    x, y, h, w = data.mnist_8x8(ds_size=200)
    x = x[y == 4]
    net = nn.UNetUndirected(2, 4, 0, img_shape=(8, 8))
    assert net.mutable_collections == ["batch_stats"]
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    before = jax.tree_util.tree_leaves(net.extra_variables["batch_stats"])
    losses = train_diffusion(diff, x, epochs=3, batch_size=8, lr=0.01, T=3,
                             key=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    after = jax.tree_util.tree_leaves(
        diff.net.extra_variables["batch_stats"])
    # running stats must have moved
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(before, after))
    assert moved, "batch_stats did not update during training"
    out = diff.eval().sample(n_iters=3, only_last=True,
                             key=jax.random.PRNGKey(1))
    assert out.shape == (10, 1, 8, 8)


def test_checkpoint_roundtrip(tmp_path):
    x, y, h, w = data.mnist_8x8(ds_size=150)
    x = x[y == 4]
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))
    losses = train_diffusion(diff, x, epochs=2, batch_size=8, lr=0.02, T=3)
    save_diffusion(diff, tmp_path, 4, losses, 2)

    net2 = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=99)
    diff2 = Diffusion(net=net2, prediction_goal="data", shape=(h, w))
    lv, ep = load_diffusion(diff2, str(tmp_path), 4)
    assert ep == 2 and len(lv) == 2
    for a, b in zip(jax.tree_util.tree_leaves(diff.net.params),
                    jax.tree_util.tree_leaves(diff2.net.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # identical samples after restore
    fx = jax.random.uniform(jax.random.PRNGKey(5), (4, 1, 8, 8))
    s1 = np.asarray(diff.eval().sample(n_iters=2, first_x=fx))
    s2 = np.asarray(diff2.eval().sample(n_iters=2, first_x=fx))
    np.testing.assert_allclose(s1, s2, atol=1e-7)
    # missing checkpoint degrades to fresh start
    lv3, ep3 = load_diffusion(diff2, str(tmp_path / "nope"), 4)
    assert lv3 == [] and ep3 == 0


def test_logger_tee(tmp_path, capsys):
    from qiddm_tpu.logging_utils import Logger

    logfile = tmp_path / "log.txt"
    lg = Logger(str(logfile))
    lg.write("hello tee\n")
    lg.flush()
    assert "hello tee" in logfile.read_text()


def test_bench_path_smoke(capsys):
    """bench.py's code path must run (tiny config, CPU): one JSON line with
    the required keys."""
    import json
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench

    rec, detail, util = bench.bench_qiddm_a(epochs=2, batch_size=8, tau=2,
                                            L=2, N=1)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "data"}
    assert rec["value"] > 0
    # data provenance is explicit in the bench output (offline fallback vs
    # real data — VERDICT r2 weak #7)
    assert "real" in rec["data"] or "fallback" in rec["data"]
    assert "images" in detail
    assert util["achieved_gflops"] > 0 and "pct_of_v5e_bf16_peak" in util


def test_bench_main_driver_contract(monkeypatch, capsys):
    """main() must print the primary record as ONE JSON line on stdout
    (the driver parses it); everything else goes to stderr as comments."""
    import json
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench

    monkeypatch.setattr(bench, "bench_qiddm_a", lambda: (
        {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0},
        "detail", {"achieved_gflops": 1.0}))
    bench.main([])
    out = capsys.readouterr()
    lines = [ln for ln in out.out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    # device records which backend actually ran (honest labeling when the
    # TPU tunnel is down and bench falls back to CPU)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "device"}
    assert rec["device"].startswith("cpu")  # test env pins cpu
    assert all(ln.startswith("#") for ln in out.err.splitlines()
               if ln.strip())


@pytest.mark.slow
def test_bench_suite_extras_smoke():
    """The suite-only benches run at tiny configs on CPU (the real configs
    are TPU-sized: dm at 8 wires, gate chain at 16 wires)."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import bench

    rec, detail = bench.bench_noise_dm_sampling(
        batch=2, iters=2, reps=1, size=8, hidden=4, L=2, N=1)
    assert rec["value"] > 0 and "density-matrix" in detail

    rec, detail = bench.bench_wide_reupload(wires=5, L=2, k=2, batch=3,
                                            steps=3)
    assert rec["value"] > 0 and rec["vs_baseline"] is None
    assert "loss" in detail


def test_x64_parity_sharded_path_subprocess():
    """The mesh-sharded reupload program must keep float64 precision end to
    end (regression: its encode phases used to be accumulated in float32
    regardless of the requested dtype)."""
    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, %r)
from qiddm_tpu import config
config.enable_x64()
import jax.numpy as jnp, numpy as np
from qiddm_tpu.parallel import make_mesh
from qiddm_tpu.sim import engine
mesh = make_mesh(8, ("data",))
rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=(2, 2, 5, 3)) * 0.5)
x = jnp.asarray(rng.uniform(size=(3, 5)))
got = np.asarray(engine.reupload_block(x, w, readout="expvalz", mesh=mesh,
                                       cdtype=jnp.complex128))
want = np.asarray(engine.reupload_block(x, w, readout="expvalz",
                                        cdtype=jnp.complex128))
err = float(np.abs(got - want).max())
assert err < 1e-12, err
print("X64_SHARDED_OK", err)
"""
    repo = str(pathlib.Path(__file__).parent.parent)
    out = subprocess.run([sys.executable, "-c", code % repo],
                         capture_output=True, text=True, timeout=300)
    assert "X64_SHARDED_OK" in out.stdout, out.stderr[-2000:]


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend: save (sync + async) and restore, including restore
    directly onto a mesh sharding."""
    import jax
    import jax.numpy as jnp

    from qiddm_tpu import nn
    from qiddm_tpu.ckpt import load_orbax, save_orbax
    from qiddm_tpu.parallel import make_mesh

    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
    save_orbax(tmp_path / "ck1", net.variables, loss_values=[0.4, 0.3],
               epochs=2)
    got = load_orbax(tmp_path / "ck1")
    assert got["meta"]["epochs"] == 2 and got["meta"]["loss_values"][1] == 0.3
    for a, b in zip(jax.tree_util.tree_leaves(got["variables"]),
                    jax.tree_util.tree_leaves(net.variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # async save joins before restore
    ck = save_orbax(tmp_path / "ck2", net.variables, async_save=True)
    ck.wait_until_finished()
    again = load_orbax(tmp_path / "ck2", like={
        "variables": net.variables,
        "meta": {"loss_values": [], "epochs": 0}})
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(again["variables"])[0]),
        np.asarray(jax.tree_util.tree_leaves(net.variables)[0]))

    # stacked per-trial params restored straight onto the 8-device mesh
    mesh = make_mesh(8, ("trial",))
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("trial"))
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * 8), net.variables["params"])
    save_orbax(tmp_path / "ck3", stacked)
    restored = load_orbax(tmp_path / "ck3", like={"variables": stacked},
                          sharding=sharding)
    leaf = jax.tree_util.tree_leaves(restored["variables"])[0]
    assert "trial" in str(leaf.sharding.spec)
    np.testing.assert_allclose(
        np.asarray(leaf),
        np.asarray(jax.tree_util.tree_leaves(stacked)[0]))

    # like-restore of a checkpoint with a recorded loss curve AND an
    # opt_state on disk that `like` doesn't mention (partial restore)
    import optax

    opt_state = optax.adam(0.01).init(net.variables["params"])
    save_orbax(tmp_path / "ck4", net.variables, loss_values=[0.5, 0.4, 0.3],
               epochs=3, opt_state=opt_state)
    got4 = load_orbax(tmp_path / "ck4", like={"variables": net.variables})
    assert got4["meta"]["loss_values"] == [0.5, 0.4, 0.3]
    assert "opt_state" not in got4  # partial: only what `like` asked for
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(got4["variables"])[0]),
        np.asarray(jax.tree_util.tree_leaves(net.variables)[0]))

    # per-leaf sharding pytree: params sharded over trial, rest replicated
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    shard_tree = jax.tree_util.tree_map(lambda _: sharding, stacked)
    got5 = load_orbax(tmp_path / "ck3", like={"variables": stacked},
                      sharding={"variables": shard_tree})
    leaf5 = jax.tree_util.tree_leaves(got5["variables"])[0]
    assert "trial" in str(leaf5.sharding.spec)
    del repl


def test_checkpoint_every_preserves_optimizer_state():
    """Segmented training (--checkpoint-every) must thread Adam's moments
    across segments — two 2-epoch segments with the same keys equal one
    4-epoch run (regression: each segment used to re-init the optimizer)."""
    import jax

    from qiddm_tpu import nn
    from qiddm_tpu.diffusion import Diffusion
    from qiddm_tpu.train import train_diffusion_scan

    x = np.random.default_rng(0).uniform(size=(16, 64)).astype(np.float32)

    def run(segments):
        net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
        diff = Diffusion(net=net, prediction_goal="data", shape=(8, 8))
        losses, opt_state = [], None
        done = 0
        for seg in segments:
            out = train_diffusion_scan(
                diff, x, epochs=seg, batch_size=8, lr=0.01, T=3,
                key=jax.random.PRNGKey(100 + done), warmup=False,
                opt_state=opt_state, return_opt_state=True)
            seg_losses, _, opt_state = out
            losses += [float(v) for v in seg_losses]
            done += seg
        return losses

    # NOTE: keys differ per segment (key=PRNGKey(100+done) like the CLI),
    # so exact equality needs the same segmentation of the key stream;
    # compare two-segment vs two-segment-without-threading instead.
    threaded = run([2, 2])

    def run_unthreaded():
        net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=0)
        diff = Diffusion(net=net, prediction_goal="data", shape=(8, 8))
        losses = []
        for done in (0, 2):
            seg_losses, _ = train_diffusion_scan(
                diff, x, epochs=2, batch_size=8, lr=0.01, T=3,
                key=jax.random.PRNGKey(100 + done), warmup=False)
            losses += [float(v) for v in seg_losses]
        return losses

    unthreaded = run_unthreaded()
    assert threaded[:2] == unthreaded[:2]          # same first segment
    assert threaded[2:] != unthreaded[2:]          # moments actually carried


def test_emnist_letters_fallback():
    """Offline EMNIST resolves to the SYNTHETIC font-rendered letters
    stand-in: 26 classes of letter-shaped images (not digits), loudly
    warned, deterministic across loads (npz-cached)."""
    import warnings

    import numpy as np

    from qiddm_tpu import data

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        x, y, h, w = data.emnist_28x28(n_classes=26, ds_size=1300)
    assert (h, w) == (28, 28) and x.shape == (1300, 784)
    assert any("SYNTHETIC" in str(r.message) for r in rec)
    labels = set(int(v) for v in y)
    assert labels == set(range(26))  # every letter class in the head slice
    assert 0.0 <= x.min() and x.max() <= 1.0
    # ink fraction sane for centered glyphs (not blank, not full-field)
    ink = (x > 0.25).mean()
    assert 0.03 < ink < 0.5, ink
    # deterministic reload (cache hit)
    x2, y2, _, _ = data.emnist_28x28(n_classes=26, ds_size=1300)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_persistent_compilation_cache(tmp_path):
    """config._setup_compilation_cache points XLA's persistent cache at
    QIDDM_XLA_CACHE_DIR (driver reruns skip compiles); empty disables it.
    Runs in subprocesses because the setup happens at package import."""
    import os

    cache_dir = tmp_path / "xla"
    prog = """
import jax
# the axon sitecustomize overrides the env var alone (see conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
import qiddm_tpu
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
@jax.jit
def f(x):
    return jax.lax.scan(lambda s, _: (jnp.tanh(s @ s), None), x, None,
                        length=8)[0]
np.asarray(f(jnp.ones((64, 64))))
print("CACHEDIR=" + str(jax.config.jax_compilation_cache_dir))
"""
    env = dict(os.environ, QIDDM_XLA_CACHE_DIR=str(cache_dir),
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, check=True)
    assert f"CACHEDIR={cache_dir}" in out.stdout
    assert any(cache_dir.iterdir()), "no cache entries written"

    env["QIDDM_XLA_CACHE_DIR"] = ""
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, check=True)
    assert "CACHEDIR=None" in out.stdout

    # default (no env var) on a CPU-only platform selection: the package
    # default stays OFF — XLA:CPU executables serialize as host AOT code
    # whose target-machine pseudo-features trip the cpu_aot_loader
    # SIGILL-risk path on every reload (config._cache_platforms_ok)
    env.pop("QIDDM_XLA_CACHE_DIR")
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, check=True)
    assert "CACHEDIR=None" in out.stdout

    # default with a non-CPU-only selection (auto / TPU present): engaged,
    # keyed by host-CPU fingerprint + jaxlib so entries never cross
    # incompatible machines. Platforms are pinned to cpu only AFTER import
    # so the gating sees the auto selection but execution stays on CPU.
    prog_auto = prog.replace(
        'import jax\n# the axon sitecustomize overrides the env var alone '
        '(see conftest.py)\njax.config.update("jax_platforms", "cpu")',
        'import jax')
    assert prog_auto != prog  # the replace must have fired
    prog_auto = prog_auto.replace(
        "import qiddm_tpu",
        'import qiddm_tpu\njax.config.update("jax_platforms", "cpu")')
    env.pop("JAX_PLATFORMS")
    out = subprocess.run([sys.executable, "-c", prog_auto], env=env,
                         capture_output=True, text=True, check=True)
    from qiddm_tpu.config import _host_cpu_fingerprint
    assert f"xla-{_host_cpu_fingerprint()}" in out.stdout


def test_deterministic_lowering_flag():
    """Importing qiddm_tpu turns off full tracebacks in MLIR locations:
    with them on, the serialized Mosaic payload of pallas_call differs on
    every trace, so kernel programs (multi-minute compiles) could never
    hit the persistent compilation cache."""
    import jax

    import qiddm_tpu  # noqa: F401  (the import applies config)

    assert jax.config.jax_include_full_tracebacks_in_locations is False


def test_ad_traced_detects_grad_tracers():
    """engine._ad_traced routes the VJP-less fused dm kernel off under
    differentiation: it must fire under jax.grad/jvp and stay quiet on
    plain (even jitted) evaluation."""
    import jax
    import jax.numpy as jnp

    from qiddm_tpu.sim.engine import _ad_traced

    seen = []

    def f(x):
        seen.append(_ad_traced(x))
        return jnp.sum(x ** 2)

    x = jnp.ones(3)
    f(x)
    jax.grad(f)(x)
    jax.jvp(f, (x,), (x,))
    assert seen == [False, True, True], seen


def test_bench_probe_honors_cpu_request(monkeypatch):
    """bench.py must not hang when the TPU tunnel is down: with
    JAX_PLATFORMS=cpu (the test env) the probe short-circuits without
    spawning the (150 s) subprocess probe."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import bench

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def no_subprocess(*a, **kw):  # pragma: no cover - must not be reached
        raise AssertionError("cpu request must skip the subprocess probe")

    monkeypatch.setattr(subprocess, "run", no_subprocess)
    assert bench._probe_backend_or_pin_cpu() == "cpu(requested)"


def test_persistent_cache_gated_off_cpu(tmp_path):
    """The default persistent compile cache must NOT engage on CPU-only
    platform selections: XLA:CPU cache entries are host-AOT machine code
    whose pseudo-features (+prefer-no-scatter) always fail the
    cpu_aot_loader host check — the SIGILL-risk path seen in the
    MULTICHIP_r03 dryrun tail. TPU/auto selections keep the cache; an
    explicit QIDDM_XLA_CACHE_DIR wins regardless (subprocess check)."""
    from qiddm_tpu import config

    assert not config._cache_platforms_ok("cpu")
    assert not config._cache_platforms_ok("cpu, cpu")
    assert config._cache_platforms_ok(None)
    assert config._cache_platforms_ok("")
    assert config._cache_platforms_ok("axon")
    assert config._cache_platforms_ok("tpu,cpu")

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    script = """
import os, sys; sys.path.insert(0, %r)
import jax
import qiddm_tpu
print("DIR", jax.config.jax_compilation_cache_dir)
""" % repo
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("QIDDM_XLA_CACHE_DIR", None)
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "DIR None" in out.stdout, (out.stdout, out.stderr)

    env["QIDDM_XLA_CACHE_DIR"] = str(tmp_path / "explicit")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=120)
    assert str(tmp_path / "explicit") in out.stdout, (out.stdout, out.stderr)
