#!/usr/bin/env python
"""Real-data quality runs: train on the reference's shipped rebuttal data.

Runs the rebuttal drivers (qiddm_tpu.cli.{bloodmnist,PneumoniaMNIST,
logo2kplus}) on the REAL training images the reference ships in its zips
(extracted to npz caches by tools/extract_reference_data.py), at the
reference's configs (epochs=15, tau=10, tau_test=5, batch_size=1, per-model
default lrs — reference src/bloodmnist.py:136-151), scoring with the
reference's rebuttal protocol (SSIM of [0,255] samples vs x_train x255,
gen=10/real=20 — src/bloodmnist.py:523-524). Writes
results/realdata_scores.json for QUALITY.md, one row per (dataset, label,
model), next to the rescored reference-shipped numbers from
tools/score_reference_samples.py.

Labels follow the shipped runs: bloodmnist 0, PneumoniaMNIST 0,
logo2kplus 1/4/5 (recovered from the shipped checkpoint names).

Usage: python tools/quality_rebuttal.py [--epochs 15] [--quick]
       (runs on the TPU; ~minutes per model+label, first compile is slow)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

MODELS = [
    ["QIDDM_PL_noise", "784", "8", "6", "2"],   # the shipped rebuttal model
    ["QDenseUndirected_old_noise", "60", "28"],  # shipped .pt's other family
    ["QIDDM_LL_noise", "784", "6", "14", "2"],   # our flagship
]

RUNS = [
    # (cli module, dataset labels, save tag)
    ("bloodmnist", [0], "blood"),
    ("PneumoniaMNIST", [0], "pneumonia"),
    ("logo2kplus", [1, 4, 5], "logo"),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--models", type=int, default=len(MODELS),
                    help="use only the first N models")
    ap.add_argument("--quick", action="store_true",
                    help="2 epochs, first model only (smoke test)")
    ap.add_argument("--out", default="results/realdata_scores.json")
    args = ap.parse_args(argv)
    epochs = 2 if args.quick else args.epochs
    n_models = 1 if args.quick else args.models

    import importlib

    results = {}
    for mod_name, labels, tag in RUNS:
        mod = importlib.import_module(f"qiddm_tpu.cli.{mod_name}")
        # --checkpoint-every 2: train in <=2-epoch device programs — a
        # single long scan over 8k batch-1 steps runs minutes on-device in
        # ONE dispatch, and dispatches over ~60s crash the remote TPU worker
        argv = ["--ds-size", "1000", "--epochs", str(epochs),
                "--checkpoint-every", "2",
                "--save-path", f"results/realdata/{tag}_",
                "--load-path", f"results/realdata/{tag}_"]
        for m in MODELS[:n_models]:
            argv += ["--model"] + m
        # run the driver's training/scoring loop directly with this
        # dataset's label list (instead of the driver's default labels)
        t0 = time.time()
        cli_args = mod.parse_args(argv)
        from qiddm_tpu.cli import common
        scores = common.run_labels(
            cli_args, labels=labels, augment_to=100, tau_test=5,
            protocol=common.REBUTTAL_PROTOCOL)
        wall = time.time() - t0
        results[mod_name] = {
            "labels": labels, "scores": scores, "wall_s": round(wall, 1),
            "epochs": epochs,
        }
        print(f"== {mod_name} done in {wall:.0f}s: {scores}")
        out = pathlib.Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        # NaN is invalid strict JSON (REBUTTAL_PROTOCOL leaves psnr/cos
        # unset as float nan) — serialize them as null
        def denan(o):
            if isinstance(o, dict):
                return {k: denan(v) for k, v in o.items()}
            if isinstance(o, list):
                return [denan(v) for v in o]
            if isinstance(o, float) and o != o:
                return None
            return o

        out.write_text(json.dumps(denan(results), indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
