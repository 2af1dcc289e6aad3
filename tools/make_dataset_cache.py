#!/usr/bin/env python
"""Build .npz dataset caches for qiddm_tpu.data from raw sources.

The framework's loaders (qiddm_tpu/data.py) look for caches under
``$QIDDM_DATA_DIR`` (default ``~/qiddm_data``) named ``<dataset>_<side>.npz``
with arrays ``x`` (N, H, W[, C]) and ``y`` (N,). This tool creates them from:

* MNIST-format idx files            (--idx images.idx labels.idx)
* directories of images per class   (--imagedir root/ with one subdir/class)
* medmnist-style .npz               (--medmnist file.npz  [train split])
* CSV with a label column + pixels  (--csv file.csv)

Examples:
  python tools/make_dataset_cache.py --name fashion_28 \
      --idx train-images-idx3-ubyte train-labels-idx1-ubyte
  python tools/make_dataset_cache.py --name fruit360_64 --side 64 \
      --imagedir ~/fruits-360/Training
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from qiddm_tpu.data import DATA_DIR, _read_idx  # noqa: E402


def from_idx(images_path, labels_path):
    x = _read_idx(pathlib.Path(images_path))
    y = _read_idx(pathlib.Path(labels_path))
    return x, y


def from_imagedir(root, side):
    from PIL import Image

    root = pathlib.Path(os.path.expanduser(root))
    classes = sorted(p for p in root.iterdir() if p.is_dir())
    xs, ys = [], []
    for ci, cdir in enumerate(classes):
        for f in sorted(cdir.iterdir()):
            if f.suffix.lower() not in (".png", ".jpg", ".jpeg", ".bmp"):
                continue
            img = Image.open(f).convert("L").resize((side, side))
            xs.append(np.asarray(img, np.uint8))
            ys.append(ci)
    print(f"{len(xs)} images, {len(classes)} classes: "
          f"{[c.name for c in classes]}")
    return np.stack(xs), np.asarray(ys, np.int64)


def from_medmnist(path):
    z = np.load(path)
    for xk, yk in (("train_images", "train_labels"), ("x", "y")):
        if xk in z:
            return np.asarray(z[xk]), np.asarray(z[yk]).reshape(-1)
    raise SystemExit(f"unrecognized npz keys: {list(z.keys())}")


def from_csv(path, label_col=0):
    import pandas as pd

    df = pd.read_csv(path)
    y = df.iloc[:, label_col].to_numpy()
    x = df.drop(df.columns[label_col], axis=1).to_numpy()
    side = int(np.sqrt(x.shape[1]))
    if side * side != x.shape[1]:
        raise SystemExit(
            f"CSV rows have {x.shape[1]} pixel columns, which is not a "
            f"square image; this tool only supports square CSV images "
            f"(check --label-col, currently {label_col})")
    return x.reshape(-1, side, side), y


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", required=True,
                   help="cache name, e.g. mnist_28 / fashion_28 / "
                        "bloodmnist_28 / fruit360_64")
    p.add_argument("--side", type=int, default=None)
    p.add_argument("--idx", nargs=2, metavar=("IMAGES", "LABELS"))
    p.add_argument("--imagedir", type=str)
    p.add_argument("--medmnist", type=str)
    p.add_argument("--csv", type=str)
    p.add_argument("--label-col", type=int, default=0,
                   help="label column index for --csv (default 0)")
    args = p.parse_args()

    if args.idx:
        x, y = from_idx(*args.idx)
    elif args.imagedir:
        x, y = from_imagedir(args.imagedir, args.side or 64)
    elif args.medmnist:
        x, y = from_medmnist(args.medmnist)
    elif args.csv:
        x, y = from_csv(args.csv, label_col=args.label_col)
    else:
        raise SystemExit("choose one of --idx / --imagedir / --medmnist / --csv")

    DATA_DIR.mkdir(parents=True, exist_ok=True)
    out = DATA_DIR / f"{args.name}.npz"
    np.savez_compressed(out, x=x, y=y)
    print(f"wrote {out}: x{x.shape} {x.dtype}, y{y.shape}, "
          f"{len(np.unique(y))} classes")


if __name__ == "__main__":
    main()
