#!/usr/bin/env python
"""Real-data quality parity gate vs the reference's recorded baseline.

The reference ships exactly one quantitative quality record: the 16
completed trials of `tune_results/train_mnist28_2024-11-20_12-38-25/`
(QIDDM-A/differN family, L=9, N=2, batch 8, tau 10, 30 epochs, MNIST-28
label 4, ds_size 500; best SSIM **0.2644** at lr=0.0459 — BASELINE.md).
This environment has no network egress and no real MNIST files, so the
replication so far ran on the loudly-warned sklearn-digits fallback
(QUALITY.md). This tool closes the loop the moment real data lands:

    python tools/parity_gate.py            # full 16-trial gate
    python tools/parity_gate.py --quick    # 4 trials, fewer epochs (smoke)

Behavior:
* If the loader falls back to synthetic data (no `mnist_28.npz` under
  ``$QIDDM_DATA_DIR`` and no torchvision idx files), the gate SKIPS with
  exit code 3 and prints the one command that ingests real data
  (tools/make_dataset_cache.py). ``--allow-fallback`` overrides (fixture
  tests).
* With real data present it reruns the reference's 16 recorded (lr)
  trials — same architecture, label, split, epochs, batch, tau, scoring
  protocol (held-out test images, 5-step sample, get_ssim_single
  semantics via sweep.sweep_lr) — and asserts
  ``best SSIM >= expect * (1 - rtol)`` (default 0.2644 within 1%;
  higher is a pass: the gate guards against *regression below* the
  reference, not against beating it).
* Writes the trial table + verdict to ``results/realdata_parity.json``
  for QUALITY.md to cite.

Exit codes: 0 = gate PASSED (or skipped-by-flag), 1 = gate FAILED,
3 = skipped (no real data).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import warnings

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# the 16 recorded learning rates, in trial order 479db_00000..00015
# (reference tune_results .../result.json; table in BASELINE.md)
REFERENCE_TRIAL_LRS = [
    0.0123, 0.0025, 0.0251, 0.0013, 0.0070, 0.0020, 0.0336, 0.0063,
    0.0650, 0.0523, 0.0459, 0.0102, 0.0123, 0.0187, 0.0055, 0.0194,
]
REFERENCE_BEST_SSIM = 0.2644


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="real-data SSIM parity gate vs the reference sweep")
    p.add_argument("--data", default="mnist_28x28")
    p.add_argument("--label", type=int, default=4)
    p.add_argument("--n-classes", type=int, default=10)
    p.add_argument("--ds-size", type=int, default=500)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--tau", type=int, default=10)
    p.add_argument("--L", type=int, default=9)
    p.add_argument("--N", type=int, default=2)
    p.add_argument("--expect", type=float, default=REFERENCE_BEST_SSIM,
                   help="reference best SSIM to gate against")
    p.add_argument("--rtol", type=float, default=0.01,
                   help="allowed relative shortfall vs --expect")
    p.add_argument("--trials", type=int, default=0,
                   help="limit to the first N recorded trials (0 = all 16)")
    p.add_argument("--quick", action="store_true",
                   help="4 trials x 5 epochs smoke run")
    p.add_argument("--allow-fallback", action="store_true",
                   help="run the gate even on synthetic fallback data "
                        "(fixture tests; the threshold still applies)")
    p.add_argument("--report", default="results/realdata_parity.json")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def load_with_provenance(args):
    from qiddm_tpu import data

    with warnings.catch_warnings(record=True) as wrec:
        warnings.simplefilter("always")
        x, y, h, w = getattr(data, args.data)(n_classes=args.n_classes,
                                              ds_size=args.ds_size)
    fell_back = any("falling back" in str(r.message)
                    or "SYNTHETIC" in str(r.message) for r in wrec)
    return (x, y, h, w), ("offline-fallback" if fell_back else "real")


def main(argv=None):
    args = parse_args(argv)
    if args.quick:
        args.trials = args.trials or 4
        args.epochs = min(args.epochs, 5)

    (x, y, h, w), provenance = load_with_provenance(args)
    if provenance != "real" and not args.allow_fallback:
        from qiddm_tpu.data import DATA_DIR

        print(f"SKIP: {args.data} resolved to the offline synthetic "
              f"fallback — the parity gate needs real data.\n"
              f"Ingest it once with:\n"
              f"  python tools/make_dataset_cache.py --name mnist_28 "
              f"--idx train-images-idx3-ubyte train-labels-idx1-ubyte\n"
              f"(cache dir: {DATA_DIR}) and rerun this tool.")
        return 3

    import numpy as np

    from qiddm_tpu import nn
    from qiddm_tpu.sweep import sweep_lr

    lrs = REFERENCE_TRIAL_LRS[: args.trials or None]
    xl = np.asarray(x)[np.asarray(y) == args.label]
    cutoff = int(len(xl) * 0.8)  # reference 80/20 split, mnist_ray.py:89-96
    x_train, x_test = xl[:cutoff], xl[cutoff:]
    print(f"data={args.data} ({provenance}), label={args.label}: "
          f"{len(x_train)} train / {len(x_test)} test; "
          f"{len(lrs)} trials x {args.epochs} epochs "
          f"(QIDDM-A differN L={args.L} N={args.N})")

    res = sweep_lr(
        lambda s: nn.differN_noise((h, w), args.L, args.N, 0, seed=s),
        lrs=[float(v) for v in lrs], x_train=x_train, shape=(h, w),
        epochs=args.epochs, batch_size=args.batch_size, T=args.tau,
        seed=args.seed, sample_iters=5, real_for_ssim=x_test[:20],
        local_dir=None)

    rows = [{"trial": i, "lr": float(lr),
             "loss": float(res.final_loss[i]), "ssim": float(res.ssim[i])}
            for i, lr in enumerate(lrs)]
    best = max(rows, key=lambda r: r["ssim"])
    floor = args.expect * (1.0 - args.rtol)
    passed = best["ssim"] >= floor
    verdict = {
        "gate": "PASS" if passed else "FAIL",
        "provenance": provenance,
        "data": args.data,
        "best_ssim": best["ssim"],
        "best_lr": best["lr"],
        "reference_best_ssim": args.expect,
        "floor": floor,
        "epochs": args.epochs,
        "n_trials": len(lrs),
        "trials": rows,
    }
    report = pathlib.Path(args.report)
    report.parent.mkdir(parents=True, exist_ok=True)
    report.write_text(json.dumps(verdict, indent=2) + "\n")
    print(f"best SSIM {best['ssim']:.4f} (lr={best['lr']}) vs reference "
          f"{args.expect} (floor {floor:.4f}) -> {verdict['gate']}; "
          f"report: {report}")
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
