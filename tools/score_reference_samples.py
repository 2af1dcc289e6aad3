#!/usr/bin/env python
"""Score the REFERENCE's shipped generated samples with qiddm_tpu's metrics.

The reference zips ship, per rebuttal run, the final model's denoising
trajectories (``image_{1..10}/step_{1..6}.png`` — tau_test=5, reference
src/bloodmnist.py:271-277) next to the exact training set it was scored
against (``image_0/train_image_*.png``). `tools/extract_reference_data.py`
converts both to npz. This tool replays the reference's rebuttal scoring
protocol (SSIM/PSNR/cos of generated [0,255] vs per-image min-max x255
train images, gen_img_count=10, real_img_count=20 —
src/bloodmnist.py:248-260,523-524) on those shipped samples using OUR metric
code, producing the cross-framework comparison column for QUALITY.md:
same data, same metric implementation, reference's model outputs.

plt.imsave min-max normalized each saved PNG, so the reconstruction
(png/255*255) recovers the original [0,255] sample up to a per-image affine
rescale + 8-bit quantization; the identical transform chain applies to the
real images, keeping the comparison fair.

Usage: python tools/score_reference_samples.py  (runs on CPU)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from qiddm_tpu import metrics  # noqa: E402
from qiddm_tpu.data import DATA_DIR  # noqa: E402

# generated-npz name -> (train cache name, label)
SETS = {
    "bloodmnist": ("bloodmnist_28", 0),
    "pneumoniamnist": ("pneumoniamnist_28", 0),
    "logo2kplus_1": ("logo2kplus_28", 1),
    "logo2kplus_4": ("logo2kplus_28", 4),
    "logo2kplus_5": ("logo2kplus_28", 5),
}


def score_one(gen_name, cache_name, label, gen_count=10, real_count=20):
    gz = np.load(DATA_DIR / f"ref_generated_{gen_name}.npz")
    steps = np.asarray(gz["steps"], np.float64)  # (iters, n, H, W) in [0,1]
    gen = steps[:, :, None] * 255.0  # (iters, n, 1, H, W) in [0,255]

    tz = np.load(DATA_DIR / f"{cache_name}.npz")
    x, y = np.asarray(tz["x"], np.float64), np.asarray(tz["y"])
    real = x[y == label][:, None]  # (n, 1, H, W)
    rmin = real.reshape(len(real), -1).min(1)[:, None, None, None]
    rmax = real.reshape(len(real), -1).max(1)[:, None, None, None]
    real = np.clip((real - rmin) / (rmax - rmin + 1e-7) * 255.0, 0, 255)

    s = metrics.ssim_iterations(gen, real, gen_count, real_count)
    p = metrics.psnr_iterations(gen, real, gen_count, real_count)
    c = metrics.cosine_iterations(gen, real, gen_count, real_count)
    return {
        "ssim_last": float(s[-1]), "ssim_best": float(np.max(s)),
        "psnr_last": float(p[-1]), "cos_last": float(c[-1]),
        "n_real": int(len(real)), "n_gen": int(gen.shape[1]),
        "iters": int(gen.shape[0]),
    }


def main():
    out = {}
    for gen_name, (cache_name, label) in SETS.items():
        try:
            out[gen_name] = score_one(gen_name, cache_name, label)
            print(gen_name, json.dumps(out[gen_name]))
        except FileNotFoundError as e:
            print(f"{gen_name}: missing cache ({e}); run "
                  f"tools/extract_reference_data.py first")
    path = pathlib.Path("results") / "reference_shipped_scores.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
