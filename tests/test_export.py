"""AOT serving artifacts (qiddm_tpu/export.py): the exported program
matches the live sampler numerically, artifacts survive
serialize/deserialize with no model code, a CPU host can emit the TPU
artifact (cross-platform lowering), and the CLI round-trips
--export -> --from-export."""

import numpy as np
import pytest

import jax

from qiddm_tpu import nn
from qiddm_tpu.diffusion import Diffusion
from qiddm_tpu.export import export_sampler, load_sampler


def _diff(seed=0):
    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 0, seed=seed)
    return Diffusion(net=net, prediction_goal="data", shape=(8, 8)).eval()


def test_export_roundtrip_matches_live_sampler():
    diff = _diff()
    blob = export_sampler(diff, batch=5, n_iters=3)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_sampler(blob)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 1, 8, 8)) * 0.75 + 0.5
    got = np.asarray(fn(x))
    want = np.asarray(diff.sample_fn(diff.net.variables, x, 3,
                                     only_last=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_is_self_contained_grid_mode():
    """only_last=False emits the reference's stacked grid; the loaded
    callable needs no qiddm_tpu state (variables are program constants)."""
    diff = _diff(seed=3)
    blob = export_sampler(diff, batch=2, n_iters=4, only_last=False)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 8, 8))
    want = np.asarray(diff.sample_fn(diff.net.variables, x, 4))
    # mutate the live model afterwards — the artifact must not care
    diff.net.variables = jax.tree_util.tree_map(
        lambda a: a * 0, diff.net.variables)
    got = np.asarray(load_sampler(blob)(x))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (5 * 8, 2 * 8)


def test_export_cross_platform_tpu_artifact():
    """A CPU build host can emit the TPU serving artifact (execution then
    needs a TPU — only the lowering/serialization is asserted here)."""
    from qiddm_tpu import export as export_mod

    blob = export_sampler(_diff(), batch=2, n_iters=2, platforms=("tpu",))
    header, rest = export_mod._unpack(blob)
    exp = jax.export.deserialize(bytearray(rest[header["var_len"]:]))
    assert [p.lower() for p in exp.platforms] == ["tpu"]


def test_export_variables_hot_swap():
    """Variables ride as program ARGUMENTS (not baked constants — the
    constants route made wide compose-circuits 7x slower, see export.py
    docstring), so retrained weights hot-swap into an existing artifact."""
    d1, d2 = _diff(seed=0), _diff(seed=5)
    blob = export_sampler(d1, batch=3, n_iters=2)
    x = jax.random.uniform(jax.random.PRNGKey(4), (3, 1, 8, 8))
    want2 = np.asarray(d2.sample_fn(d2.net.variables, x, 2, only_last=True))
    got2 = np.asarray(load_sampler(blob, variables=d2.net.variables)(x))
    np.testing.assert_allclose(got2, want2, atol=1e-5)
    # and without the override it still serves d1's weights
    want1 = np.asarray(d1.sample_fn(d1.net.variables, x, 2, only_last=True))
    np.testing.assert_allclose(np.asarray(load_sampler(blob)(x)), want1,
                               atol=1e-5)


def test_export_rejects_trajectory_models():
    from qiddm_tpu.cli.common import with_noise

    net = nn.QIDDM_LL_noise(64, 4, 2, 1, 1, seed=0)
    net = with_noise(net, 1, 0.05, noise_trajectories=16)
    diff = Diffusion(net=net, prediction_goal="data", shape=(8, 8)).eval()
    with pytest.raises(ValueError, match="trajectory"):
        export_sampler(diff, batch=2, n_iters=2)


def test_sample_cli_export_roundtrip(tmp_path):
    from qiddm_tpu.ckpt import save_diffusion
    from qiddm_tpu.cli import sample as sample_cli

    diff = _diff(seed=7)
    ckpt_path = save_diffusion(diff, str(tmp_path), 0, [0.5], 1)
    art = tmp_path / "sampler.shlo"
    base = ["--model", "QIDDM_LL_noise", "64", "4", "2", "1",
            "--img_size", "8", "--n", "6", "--iters", "3"]
    out = sample_cli.main(["--ckpt", str(ckpt_path), *base,
                           "--export", str(art)])
    assert out is None and art.exists()

    served = sample_cli.main(["--from-export", str(art),
                              "--img_size", "8", "--n", "6", "--iters", "3",
                              "--out", str(tmp_path / "s"),
                              "--format", "npz", "--seed", "5"])
    direct = sample_cli.main(["--ckpt", str(ckpt_path), *base,
                              "--out", str(tmp_path / "d"),
                              "--format", "npz", "--seed", "5"])
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               atol=1e-5)


def test_bundle_serves_any_request_size():
    """Bucketed bundle: smallest bucket >= n with row padding; oversize
    requests chunk through the largest bucket. Per-image denoising is
    batch-independent, so every row must equal the live sampler's."""
    from qiddm_tpu.export import (export_sampler_bundle, is_bundle,
                                  load_sampler, load_sampler_bundle)

    diff = _diff(seed=11)
    blob = export_sampler_bundle(diff, batches=[2, 4], n_iters=3)
    assert is_bundle(blob)
    serve = load_sampler_bundle(blob)
    for n in (1, 2, 3, 4, 5, 9):
        x = jax.random.uniform(jax.random.PRNGKey(n), (n, 1, 8, 8))
        got = np.asarray(serve(x))
        want = np.asarray(diff.sample_fn(diff.net.variables, x, 3,
                                         only_last=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    # n == 0 serves an empty batch without touching a program
    empty = np.asarray(serve(jax.numpy.zeros((0, 1, 8, 8))))
    assert empty.shape == (0, 1, 8, 8) and empty.dtype == np.float32

    # single-batch artifacts are NOT bundles and the loaders cross-reject
    single = export_sampler(diff, batch=2, n_iters=2)
    assert not is_bundle(single)
    with pytest.raises(ValueError, match="bundle"):
        load_sampler_bundle(single)
    with pytest.raises(ValueError, match="bundle"):
        load_sampler(blob)


def test_artifacts_are_pickle_free():
    """Loading an artifact must execute no embedded code: the variables
    segment is raw npz + a JSON path table (np.load with
    allow_pickle=False), and the retired pickle-bearing formats are
    rejected outright."""
    from qiddm_tpu import export as export_mod

    diff = _diff(seed=2)
    blob = export_sampler(diff, batch=2, n_iters=2)
    header, rest = export_mod._unpack(blob)
    # decodes under allow_pickle=False (raises ValueError on any pickle)
    v = export_mod._vars_from_blob(header["var_paths"],
                                   rest[:header["var_len"]])
    flat_want = jax.tree_util.tree_leaves(diff.net.variables)
    flat_got = jax.tree_util.tree_leaves(v)
    assert len(flat_want) == len(flat_got)
    for a, b in zip(flat_want, flat_got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for magic in (b"QSA2", b"QSB2", b"QSB1"):
        with pytest.raises(ValueError, match="retired"):
            load_sampler(magic + blob[4:])


def test_sample_cli_bundle_roundtrip(tmp_path):
    from qiddm_tpu.ckpt import save_diffusion
    from qiddm_tpu.cli import sample as sample_cli

    diff = _diff(seed=13)
    ckpt_path = save_diffusion(diff, str(tmp_path), 0, [0.5], 1)
    art = tmp_path / "bundle.shlo"
    sample_cli.main(["--ckpt", str(ckpt_path),
                     "--model", "QIDDM_LL_noise", "64", "4", "2", "1",
                     "--img_size", "8", "--iters", "3",
                     "--export", str(art), "--export-batches", "2,4"])
    served = sample_cli.main(["--from-export", str(art),
                              "--img_size", "8", "--n", "7", "--iters", "3",
                              "--out", str(tmp_path / "s"),
                              "--format", "npz"])
    assert np.asarray(served).shape == (7, 1, 8, 8)


def test_var_blob_decoder_hardening():
    """Decoder edge cases the round-trip tests can't reach: list-rooted
    trees, tuple containers, crafted headers (sequence-index DoS,
    out-of-range var_len), truncated blobs."""
    import json
    import struct

    from qiddm_tpu import export as export_mod

    # list-rooted variables round-trip (previously AttributeError'd)
    v = [np.ones((2,), np.float32), {"a": np.zeros((3,), np.float32)}]
    paths, vb = export_mod._var_blob(v)
    out = export_mod._vars_from_blob(paths, vb)
    assert (jax.tree_util.tree_structure(out)
            == jax.tree_util.tree_structure(v))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(a, b)

    # tuples are rejected at export (the decoder rebuilds lists, so the
    # treedef would silently differ from the traced one)
    with pytest.raises(ValueError, match="tuple"):
        export_mod._var_blob({"a": (np.ones(2), np.zeros(2))})
    with pytest.raises(ValueError, match="tuple"):
        export_mod._var_blob([(np.ones(2),)])

    # crafted sequence index must not grow a padding list until OOM
    with pytest.raises(ValueError, match="out of range"):
        export_mod._vars_from_blob([[["s", 10**9]]], vb)
    with pytest.raises(ValueError, match="out of range"):
        export_mod._vars_from_blob([[["s", -3]]], vb)

    # var_len outside the payload
    diff = _diff(seed=3)
    blob = export_sampler(diff, batch=2, n_iters=2)
    header, rest = export_mod._unpack(blob)
    for bad in (-1, len(rest) + 1, None):
        h = dict(header, var_len=bad)
        hb = json.dumps(h).encode()
        crafted = (export_mod._ARTIFACT_MAGIC
                   + struct.pack("<I", len(hb)) + hb + rest)
        with pytest.raises(ValueError, match="var_len"):
            load_sampler(crafted)

    # truncated / header-length-past-end blobs
    with pytest.raises(ValueError, match="truncated"):
        export_mod._unpack(b"QSA3")
    with pytest.raises(ValueError, match="header length"):
        export_mod._unpack(b"QSA3" + struct.pack("<I", 10**6) + b"{}")


def test_bundle_empty_batch_contract():
    """n == 0 keeps the same shape contract as n > 0: wrong spatial tails
    error instead of echoing back, and the output tail/dtype come from
    the exported program."""
    from qiddm_tpu.export import export_sampler_bundle, load_sampler_bundle

    diff = _diff(seed=5)
    serve = load_sampler_bundle(
        export_sampler_bundle(diff, batches=[2], n_iters=2))
    out = np.asarray(serve(jax.numpy.zeros((0, 1, 8, 8))))
    assert out.shape == (0, 1, 8, 8) and out.dtype == np.float32
    with pytest.raises(ValueError, match="expects inputs"):
        serve(jax.numpy.zeros((0, 1, 16, 16)))


def test_sample_cli_from_export_rejects_export_batches(tmp_path):
    from qiddm_tpu.cli import sample as sample_cli

    (tmp_path / "x.shlo").write_bytes(b"QSB3")
    with pytest.raises(SystemExit, match="export-batches"):
        sample_cli.main(["--from-export", str(tmp_path / "x.shlo"),
                         "--img_size", "8", "--export-batches", "1,8"])
