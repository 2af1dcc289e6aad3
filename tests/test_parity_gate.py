"""Fixture tests for tools/parity_gate.py (VERDICT r3 item 2).

The gate's real purpose fires only when real MNIST-28 lands in
``$QIDDM_DATA_DIR`` (zero-egress environment — see QUALITY.md). These
tests pin its plumbing with a fabricated fixture cache so the moment
real data appears the gate is known-good:

* no cache        -> SKIP (exit 3) with the ingestion command printed
* fixture cache   -> detected as "real" provenance, 16-trial protocol
                     subsettable, report JSON written, threshold applied
                     in both directions (pass and fail).
"""

import importlib.util
import json
import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture()
def parity_gate():
    spec = importlib.util.spec_from_file_location(
        "parity_gate", ROOT / "tools" / "parity_gate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def data_dir(tmp_path, monkeypatch):
    """Point the loader's cache directory at an empty tmp dir."""
    from qiddm_tpu import data

    d = tmp_path / "qiddm_data"
    d.mkdir()
    monkeypatch.setattr(data, "DATA_DIR", d)
    return d


def _write_fixture_cache(d: pathlib.Path, n: int = 120) -> None:
    """Fabricate an mnist_28.npz: class-structured 28x28 images whose
    label-4 slice is learnable enough for the gate's smoke settings."""
    rng = np.random.default_rng(0)
    y = np.tile(np.arange(10), n // 10 + 1)[:n]
    yy, xx = np.mgrid[0:28, 0:28] / 28.0
    x = 0.5 + 0.4 * np.sin((1.0 + y)[:, None, None] * np.pi * (xx + yy))
    x = np.clip(x + 0.05 * rng.standard_normal((n, 28, 28)), 0, 1)
    np.savez(d / "mnist_28.npz", x=x.astype(np.float32), y=y)


def test_gate_skips_without_real_data(parity_gate, data_dir, capsys):
    rc = parity_gate.main(["--quick"])
    assert rc == 3
    out = capsys.readouterr().out
    assert "SKIP" in out and "make_dataset_cache.py" in out


def test_gate_runs_on_fixture_cache(parity_gate, data_dir, tmp_path):
    _write_fixture_cache(data_dir)
    report = tmp_path / "parity.json"
    rc = parity_gate.main([
        "--trials", "1", "--epochs", "1", "--ds-size", "60",
        "--expect", "0.0", "--report", str(report)])
    assert rc == 0
    v = json.loads(report.read_text())
    assert v["gate"] == "PASS"
    assert v["provenance"] == "real"  # fixture cache != synthetic fallback
    assert v["n_trials"] == 1
    assert v["trials"][0]["lr"] == pytest.approx(
        parity_gate.REFERENCE_TRIAL_LRS[0])
    assert 0.0 <= v["best_ssim"] <= 1.0


def test_gate_fails_below_threshold(parity_gate, data_dir, tmp_path):
    _write_fixture_cache(data_dir)
    report = tmp_path / "parity_fail.json"
    rc = parity_gate.main([
        "--trials", "1", "--epochs", "1", "--ds-size", "60",
        "--expect", "0.99", "--report", str(report)])
    assert rc == 1
    assert json.loads(report.read_text())["gate"] == "FAIL"


def test_recorded_trial_table_matches_reference_count(parity_gate):
    # 16 completed trials in the reference's tune_results record
    assert len(parity_gate.REFERENCE_TRIAL_LRS) == 16
    assert parity_gate.REFERENCE_BEST_SSIM == pytest.approx(0.2644)
    # best lr from the reference record must be in the replay table
    assert 0.0459 in parity_gate.REFERENCE_TRIAL_LRS
