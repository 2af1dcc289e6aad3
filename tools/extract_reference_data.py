#!/usr/bin/env python
"""Build REAL-data .npz caches from the reference's shipped rebuttal zips.

The reference release ships its actual training data as PNGs inside
``results_rebuttal_complex_dataset/{medmnist,logo2kplus}.zip``: every run
directory has an ``image_0/train_image_*.png`` dump of the exact (post
augmentation) per-label training set (reference src/bloodmnist.py:263-268),
plus ``image_{1..10}/step_*.png`` — the generated denoising trajectories of
the run's final model. This tool converts the train dumps into the
``<dataset>_<side>.npz`` caches that qiddm_tpu.data's loaders pick up, and
the generated trajectories into ``ref_generated_<dataset>.npz`` for
like-for-like metric scoring (QUALITY.md).

Label conventions recovered from the shipped checkpoint filenames
(``QIDDM_PL_noise=8_L=6_N=2_<label>.pt``):
  bloodmnist      image_0 -> label 0   (681 images)
  PneumoniaMNIST  image_0 -> label 0   (240 images)
  logo2kplus      Ascari -> 1, "Phillips 66" -> 4, Sanyo -> 5  (100 each)

The PNGs are plt.imsave(cmap="gray") outputs: per-image min-max normalized,
8-bit quantized, RGBA with R=G=B. Reconstruction uses the R channel / 255.
The same transform was applied to the reference's generated step PNGs, so
scoring both against this data is a fair cross-framework comparison.

Usage:  python tools/extract_reference_data.py [--zips-dir DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import io
import pathlib
import re
import sys
import zipfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from qiddm_tpu.data import DATA_DIR  # noqa: E402

REF_ZIPS = pathlib.Path("/root/reference/results_rebuttal_complex_dataset")

# dataset -> list of (zip name, path prefix inside zip, label)
TRAIN_SETS = {
    "bloodmnist_28": [("medmnist.zip", "medmnist/bloodmnist/image_0/", 0)],
    "pneumoniamnist_28": [
        ("medmnist.zip", "medmnist/PneumoniaMNIST/image_0/", 0)],
    "logo2kplus_28": [
        ("logo2kplus.zip", "logo2kplus/Ascari/image_0/", 1),
        ("logo2kplus.zip", "logo2kplus/Phillips 66/image_0/", 4),
        ("logo2kplus.zip", "logo2kplus/Sanyo/image_0/", 5),
    ],
}

# dataset -> (zip name, run dir prefix) holding image_{1..}/step_*.png
GENERATED_SETS = {
    "bloodmnist": ("medmnist.zip", "medmnist/bloodmnist/"),
    "pneumoniamnist": ("medmnist.zip", "medmnist/PneumoniaMNIST/"),
    "logo2kplus_1": ("logo2kplus.zip", "logo2kplus/Ascari/"),
    "logo2kplus_4": ("logo2kplus.zip", "logo2kplus/Phillips 66/"),
    "logo2kplus_5": ("logo2kplus.zip", "logo2kplus/Sanyo/"),
}


def _png_to_gray(data: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    a = np.asarray(img)
    if a.ndim == 3:  # RGBA/ RGB from plt.imsave — channels are identical
        a = a[..., 0]
    return a.astype(np.uint8)


def _numeric_key(name: str):
    m = re.search(r"(\d+)\.png$", name)
    return int(m.group(1)) if m else 0


def build_train_cache(name, parts, zips_dir, out_dir):
    xs, ys = [], []
    for zip_name, prefix, label in parts:
        with zipfile.ZipFile(zips_dir / zip_name) as zf:
            members = sorted(
                (n for n in zf.namelist()
                 if n.startswith(prefix) and "train_image_" in n
                 and n.endswith(".png")),
                key=_numeric_key)
            for m in members:
                xs.append(_png_to_gray(zf.read(m)))
                ys.append(label)
    x = np.stack(xs)
    y = np.asarray(ys, np.int64)
    out = out_dir / f"{name}.npz"
    np.savez_compressed(out, x=x, y=y)
    print(f"{out}: x{x.shape} uint8, labels {sorted(set(ys))} "
          f"({[int((y == l).sum()) for l in sorted(set(ys))]})")


def build_generated_cache(name, zip_name, prefix, zips_dir, out_dir):
    """ref_generated_<name>.npz: steps (n_steps, n_imgs, H, W) float in
    [0,1] — step PNGs of the run's final model, batch-major sorted."""
    with zipfile.ZipFile(zips_dir / zip_name) as zf:
        runs = {}
        for n in zf.namelist():
            m = re.match(re.escape(prefix) + r"image_(\d+)/step_(\d+)\.png$",
                         n)
            if m:
                runs.setdefault(int(m.group(1)), {})[int(m.group(2))] = n
        if not runs:
            print(f"{name}: no generated step PNGs under {prefix!r}, skipped")
            return
        n_steps = min(len(v) for v in runs.values())
        imgs = sorted(runs)
        # iterate the step keys actually present (the shipped layout is
        # 1-based contiguous, but a 0-based or gapped numbering must not
        # KeyError the whole cache build)
        step_keys = {i: sorted(runs[i])[:n_steps] for i in imgs}
        steps = np.stack([
            np.stack([_png_to_gray(zf.read(runs[i][step_keys[i][s]]))
                      for i in imgs])
            for s in range(n_steps)])
    out = out_dir / f"ref_generated_{name}.npz"
    np.savez_compressed(out, steps=steps.astype(np.float32) / 255.0,
                        image_ids=np.asarray(imgs))
    print(f"{out}: steps{steps.shape}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--zips-dir", default=str(REF_ZIPS))
    ap.add_argument("--out", default=str(DATA_DIR))
    args = ap.parse_args(argv)
    zips_dir = pathlib.Path(args.zips_dir)
    out_dir = pathlib.Path(args.out).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, parts in TRAIN_SETS.items():
        build_train_cache(name, parts, zips_dir, out_dir)
    for name, (zip_name, prefix) in GENERATED_SETS.items():
        build_generated_cache(name, zip_name, prefix, zips_dir, out_dir)


if __name__ == "__main__":
    main()
