"""Dataset loaders with the reference's signatures, offline-safe.

Reference: src/data.py — every loader returns
``(x_flat float64 (N, pixels), y int64 (N,), height, width)`` after
torchvision downloads. This environment has zero egress and no torchvision,
so each loader resolves its data in order:

1. raw dataset files already cached on disk (torchvision layout: MNIST idx
   files under ``~/mnist/MNIST/raw`` etc. — parsed natively here);
2. ``.npz`` caches under ``$QIDDM_DATA_DIR`` (default ``~/qiddm_data``) with
   arrays ``x`` (N, H, W [, C]) uint8/float and ``y`` (N,);
3. a deterministic offline fallback — real sklearn ``load_digits`` images
   resampled to the target resolution (digit-like data, loudly warned) or,
   for non-digit datasets, structured synthetic textures.

The loaders missing from the reference release though required by its
drivers — bloodmnist/PneumoniaMNIST/pathmnist/fruit/logo2k/xray
(reference src/bloodmnist.py:59-71; SURVEY §8.5) — are defined here with the
same convention.

All loaders return numpy arrays (float64 to mirror the reference's
``.double()`` pipeline; the trainer casts to the framework dtype).
"""

from __future__ import annotations

import gzip
import os
import pathlib
import struct
import warnings

import numpy as np
from sklearn import datasets as _sk_datasets

DATA_DIR = pathlib.Path(os.environ.get("QIDDM_DATA_DIR",
                                       os.path.expanduser("~/qiddm_data")))


# ---------------------------------------------------------------------------
# raw-file parsing / caches
# ---------------------------------------------------------------------------

def _read_idx(path: pathlib.Path) -> np.ndarray:
    """Parse an MNIST-format idx file (optionally gzipped)."""
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = [struct.unpack(">I", f.read(4))[0] for _ in range(ndim)]
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def _find_idx_pair(roots, img_names, lbl_names):
    for root in roots:
        root = pathlib.Path(os.path.expanduser(root))
        for sub in ("", "MNIST/raw", "FashionMNIST/raw", "EMNIST/raw", "raw"):
            base = root / sub if sub else root
            for img_n in img_names:
                for ext in ("", ".gz"):
                    img = base / (img_n + ext)
                    if not img.exists():
                        continue
                    for lbl_n in lbl_names:
                        for ext2 in ("", ".gz"):
                            lbl = base / (lbl_n + ext2)
                            if lbl.exists():
                                return img, lbl
    return None


def _load_npz_cache(name: str):
    p = DATA_DIR / f"{name}.npz"
    if p.exists():
        z = np.load(p)
        return np.asarray(z["x"]), np.asarray(z["y"])
    return None


def _digits_fallback(side: int, name: str):
    """Upsample sklearn's 8x8 digits to ``side`` — real digit images, used
    when the requested dataset is not on disk (offline environment)."""
    warnings.warn(
        f"dataset {name!r} not found on disk and this environment has no "
        f"network access; falling back to sklearn digits resampled to "
        f"{side}x{side}. Drop an .npz cache in {DATA_DIR} for real data.")
    x, y = _sk_datasets.load_digits(return_X_y=True)
    imgs = x.reshape(-1, 8, 8) / 16.0
    reps = max(1, side // 8)
    up = np.repeat(np.repeat(imgs, reps, axis=1), reps, axis=2)
    pad_h = side - up.shape[1]
    pad_w = side - up.shape[2]
    if pad_h or pad_w:
        up = np.pad(up, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                         (pad_w // 2, pad_w - pad_w // 2)))
    return up[:, :side, :side], y


def _texture_fallback(side: int, name: str, n_classes: int = 10,
                      n: int = 2000, channels: int = 1):
    """Deterministic class-structured textures for non-digit datasets."""
    warnings.warn(
        f"dataset {name!r} unavailable offline; generating deterministic "
        f"synthetic textures ({n} samples, {n_classes} classes). Drop an "
        f".npz cache in {DATA_DIR} for real data.")
    import zlib

    # stable per-name seed (Python's hash() is salted per process, which
    # would make the fallback data differ between runs)
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    yy, xx = np.mgrid[0:side, 0:side] / side
    y = rng.integers(0, n_classes, size=n)
    freqs = 1.0 + np.arange(n_classes)
    phases = rng.uniform(0, 2 * np.pi, size=(n, 2))
    base = 0.5 + 0.45 * np.sin(
        freqs[y][:, None, None] * np.pi * (xx + yy)[None] + phases[:, :1, None])
    base = base * (0.7 + 0.3 * np.cos(
        freqs[y][:, None, None] * np.pi * (xx - yy)[None] + phases[:, 1:, None]))
    base += 0.05 * rng.standard_normal((n, side, side))
    base = np.clip(base, 0, 1)
    if channels > 1:
        base = np.stack([np.roll(base, s, axis=1) for s in range(channels)], -1)
    return base, y


def _finish(imgs, labels, n_classes, ds_size, h, w):
    """Filter to the first n_classes, truncate, flatten, cast (reference
    loaders slice the head of the dataset without shuffling)."""
    mask = labels < n_classes
    imgs, labels = imgs[mask], labels[mask]
    imgs, labels = imgs[:ds_size], labels[:ds_size]
    x = imgs.reshape(len(imgs), -1).astype(np.float64)
    return x, labels.astype(np.int64), h, w


def _resize(imgs: np.ndarray, side: int) -> np.ndarray:
    """Nearest-neighbour resize of (N, H, W) to (N, side, side)."""
    n, h, w = imgs.shape[:3]
    ri = (np.arange(side) * h // side).clip(0, h - 1)
    ci = (np.arange(side) * w // side).clip(0, w - 1)
    return imgs[:, ri][:, :, ci]


def _load_mnist_like(name, roots, img_names, lbl_names, side, fallback="digits"):
    pair = _find_idx_pair(roots, img_names, lbl_names)
    if pair is not None:
        imgs = _read_idx(pair[0]).astype(np.float64) / 255.0
        labels = _read_idx(pair[1]).astype(np.int64)
        if imgs.shape[1] != side:
            imgs = _resize(imgs, side)
        return imgs, labels
    cache = _load_npz_cache(f"{name}_{side}")
    if cache is not None:
        imgs, labels = cache
        imgs = imgs.astype(np.float64)
        if imgs.max() > 1.5:
            imgs = imgs / 255.0
        if imgs.ndim == 4:  # (N, H, W, C) cache -> grayscale like siblings
            imgs = imgs.mean(axis=-1)
        if imgs.shape[1] != side:
            imgs = _resize(imgs, side)
        return imgs, labels.astype(np.int64)
    if fallback == "digits":
        return _digits_fallback(side, name)
    return _texture_fallback(side, name)


# ---------------------------------------------------------------------------
# reference loaders (src/data.py)
# ---------------------------------------------------------------------------

def mnist_8x8(n_classes=10, ds_size=100):
    """sklearn digits (reference src/data.py:10-17) — always offline-safe.
    digits has 10 classes; larger requests (e.g. the EMNIST driver's 26)
    clamp to all 10."""
    x, y = _sk_datasets.load_digits(n_class=min(n_classes, 10),
                                    return_X_y=True)
    x = (x / 16.0).reshape(-1, 64)
    x, y = x[:ds_size], y[:ds_size]
    return x.astype(np.float64), y.astype(np.int64), 8, 8


def mnist_28x28(n_classes=10, ds_size=100):
    imgs, labels = _load_mnist_like(
        "mnist", ["~/mnist", "~/data/mnist", str(DATA_DIR / "mnist")],
        ["train-images-idx3-ubyte", "train-images.idx3-ubyte"],
        ["train-labels-idx1-ubyte", "train-labels.idx1-ubyte"], 28)
    return _finish(imgs, labels, n_classes, ds_size, 28, 28)


def mnist_32x32(n_classes=10, ds_size=100):
    imgs, labels = _load_mnist_like(
        "mnist", ["~/mnist", str(DATA_DIR / "mnist")],
        ["train-images-idx3-ubyte"], ["train-labels-idx1-ubyte"], 32)
    return _finish(imgs, labels, n_classes, ds_size, 32, 32)


def fashion_28x28(n_classes=10, ds_size=100):
    imgs, labels = _load_mnist_like(
        "fashion", ["~/fashion", str(DATA_DIR / "fashion")],
        ["train-images-idx3-ubyte"], ["train-labels-idx1-ubyte"], 28,
        fallback="texture")
    return _finish(imgs, labels, n_classes, ds_size, 28, 28)


def emnist_28x28(n_classes=10, ds_size=100):
    """EMNIST letters; the reference rotates -90° and flips horizontally to
    fix the raw orientation and remaps labels 1..26 -> 0..25
    (reference src/data.py:199-225)."""
    pair = _find_idx_pair(
        ["~/emnist", str(DATA_DIR / "emnist")],
        ["emnist-letters-train-images-idx3-ubyte"],
        ["emnist-letters-train-labels-idx1-ubyte"])
    if pair is not None:
        imgs = _read_idx(pair[0]).astype(np.float64) / 255.0
        labels = _read_idx(pair[1]).astype(np.int64) - 1
        imgs = np.rot90(imgs, k=-1, axes=(1, 2))[:, :, ::-1]
    else:
        cache = _load_npz_cache("emnist_letters_28")  # user-provided real data
        if cache is not None:
            imgs, labels = cache
            imgs = imgs.astype(np.float64)
            if imgs.max() > 1.5:
                imgs = imgs / 255.0
        else:
            imgs, labels = _letters_fallback(28)
    return _finish(imgs, labels, n_classes, ds_size, 28, 28)


def _letters_fallback(side: int, per_class: int = 200):
    """SYNTHETIC letters stand-in for EMNIST (offline environment).

    Font-rendered a-z glyphs (DejaVu family, both cases) with random
    affine jitter, stroke/blur variation, and ink-centroid centering —
    white-on-black ``side x side`` images mimicking EMNIST-letters
    conventions. Letter-SHAPED data (unlike the digits fallback), so
    letter-class experiments remain meaningful offline, but NOT real
    handwriting: results on it are clearly synthetic and must be labeled
    as such. Drop real idx files or an ``emnist_letters_28.npz`` cache in
    ``$QIDDM_DATA_DIR`` for real data.

    Deterministic; cached to ``emnist_letters_synth_<side>.npz`` after the
    first render (a few seconds for 26x200 glyphs).
    """
    warnings.warn(
        "EMNIST letters not found on disk and this environment has no "
        "network access; using a SYNTHETIC font-rendered letters stand-in "
        f"(26 classes x {per_class}). Results on it are synthetic-data "
        f"results. Drop real EMNIST idx files or emnist_letters_28.npz in "
        f"{DATA_DIR} for real data.")
    cache_path = DATA_DIR / f"emnist_letters_synth_{side}.npz"
    if cache_path.exists():
        z = np.load(cache_path)
        return (np.asarray(z["x"], np.float64) / 255.0,
                np.asarray(z["y"], np.int64))

    from PIL import Image, ImageDraw, ImageFilter, ImageFont

    font_files = [
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
    ]
    font_files = [f for f in font_files if pathlib.Path(f).exists()]
    if not font_files:  # no fonts installed: keep the digits shape fallback
        return _digits_fallback(side, "emnist_letters")
    rng = np.random.default_rng(0xE71157)
    big = side * 4  # supersampled canvas for smooth strokes
    fonts = {}
    imgs, labels = [], []
    for cls in range(26):
        for _ in range(per_class):
            ch = chr((ord("A") if rng.random() < 0.5 else ord("a")) + cls)
            fkey = (font_files[int(rng.integers(len(font_files)))],
                    int(rng.integers(int(big * 0.55), int(big * 0.8))))
            if fkey not in fonts:
                fonts[fkey] = ImageFont.truetype(*fkey)
            img = Image.new("L", (big, big), 0)
            d = ImageDraw.Draw(img)
            d.text((big // 2, big // 2), ch, fill=255, font=fonts[fkey],
                   anchor="mm")
            # random affine: rotation, shear, translation (handwriting-ish)
            ang = float(rng.uniform(-20, 20))
            shear = float(rng.uniform(-0.25, 0.25))
            tx = float(rng.uniform(-0.06, 0.06)) * big
            ty = float(rng.uniform(-0.06, 0.06)) * big
            c, cy = big / 2, big / 2
            img = img.transform(
                (big, big), Image.AFFINE,
                (np.cos(np.radians(ang)), shear - np.sin(np.radians(ang)),
                 c - c * np.cos(np.radians(ang))
                 - cy * (shear - np.sin(np.radians(ang))) + tx,
                 np.sin(np.radians(ang)), np.cos(np.radians(ang)),
                 cy - c * np.sin(np.radians(ang))
                 - cy * np.cos(np.radians(ang)) + ty),
                resample=Image.BILINEAR)
            img = img.filter(ImageFilter.GaussianBlur(
                float(rng.uniform(0.5, 2.0))))
            a = np.asarray(img, np.float64)
            if a.max() > 0:  # all-black (glyph sheared out): skip centering
                # center the ink centroid (EMNIST centers by mass)
                ys, xs = np.mgrid[0:big, 0:big]
                m = a.sum()
                dy = int(round(big / 2 - (a * ys).sum() / m))
                dx = int(round(big / 2 - (a * xs).sum() / m))
                a = np.roll(np.roll(a, dy, axis=0), dx, axis=1)
            small = np.asarray(
                Image.fromarray(a.astype(np.uint8)).resize(
                    (side, side), Image.LANCZOS), np.float64)
            peak = small.max()
            if peak > 0:
                small = small / peak
            imgs.append(np.clip(small, 0.0, 1.0))
            labels.append(cls)
    imgs = np.stack(imgs)
    labels = np.asarray(labels, np.int64)
    # interleave classes so head-truncation (ds_size) keeps every class
    order = rng.permutation(len(imgs))
    imgs, labels = imgs[order], labels[order]
    # quantize BEFORE returning so cached and fresh loads are bit-identical
    x8 = (imgs * 255).astype(np.uint8)
    try:
        DATA_DIR.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(cache_path, x=x8, y=labels)
    except OSError:
        pass
    return x8.astype(np.float64) / 255.0, labels


def cifar10_32x32(n_classes=10, ds_size=100):
    cache = _load_npz_cache("cifar10_32")
    if cache is not None:
        imgs, labels = cache
        imgs = imgs.astype(np.float64)
        if imgs.max() > 1.5:
            imgs = imgs / 255.0
        if imgs.ndim == 4:  # rgb -> grayscale like the reference transform
            imgs = imgs @ np.array([0.2989, 0.587, 0.114])
    else:
        imgs, labels = _texture_fallback(32, "cifar10")
    return _finish(imgs, labels, n_classes, ds_size, 32, 32)


def _face_like(name, side, label_or_classes, ds_size):
    cache = _load_npz_cache(f"{name}_{side}")
    if cache is not None:
        imgs, labels = cache
        imgs = imgs.astype(np.float64)
        if imgs.max() > 1.5:
            imgs = imgs / 255.0
        if imgs.ndim == 4:  # RGB cache -> grayscale (reference T.Grayscale)
            imgs = imgs @ np.array([0.2989, 0.587, 0.114])
        if imgs.shape[1] != side:
            imgs = _resize(imgs, side)
    else:
        imgs, labels = _texture_fallback(side, name)
    return imgs, labels


def celeba_32x32(label=1, ds_size=10000, n_classes=None):
    """Reference signature is (label) only (src/data.py:74) — which its own
    drivers cannot call; ``n_classes`` is accepted and ignored so the
    registry/driver convention works."""
    imgs, labels = _face_like("celeba", 32, label, ds_size)
    mask = labels == label
    if mask.sum() == 0:
        mask = np.ones(len(labels), bool)
    imgs, labels = imgs[mask][:ds_size], labels[mask][:ds_size]
    return imgs.reshape(len(imgs), -1), labels.astype(np.int64), 32, 32


def celeba_64x64(label=1, ds_size=10000, n_classes=None):
    imgs, labels = _face_like("celeba", 64, label, ds_size)
    mask = labels == label
    if mask.sum() == 0:
        mask = np.ones(len(labels), bool)
    imgs, labels = imgs[mask][:ds_size], labels[mask][:ds_size]
    return imgs.reshape(len(imgs), -1), labels.astype(np.int64), 64, 64


def _lfw(side, n_classes, ds_size):
    try:
        people = _sk_datasets.fetch_lfw_people(resize=None,
                                               download_if_missing=False)
        imgs = people.images / 255.0 if people.images.max() > 1.5 else people.images
        imgs = _resize(imgs, side)
        labels = people.target
    except Exception:
        imgs, labels = _face_like(f"lfw", side, n_classes, ds_size)
    return _finish(imgs, labels, n_classes, ds_size, side, side)


def lfw_28x28(n_classes=10, ds_size=1000):
    return _lfw(28, n_classes, ds_size)


def lfw_64x64(n_classes=10, ds_size=1000):
    return _lfw(64, n_classes, ds_size)


def lfw_128x128(n_classes=10, ds_size=1000):
    return _lfw(128, n_classes, ds_size)


def lfw_512x512(n_classes=10, ds_size=1000):
    return _lfw(512, n_classes, ds_size)


# ---------------------------------------------------------------------------
# loaders required by the rebuttal drivers but missing from the reference
# release (SURVEY §8.5)
# ---------------------------------------------------------------------------

def _medmnist(name, side, n_classes, ds_size):
    cache = _load_npz_cache(f"{name}_{side}") or _load_npz_cache(name)
    if cache is not None:
        imgs, labels = cache
        imgs = imgs.astype(np.float64)
        if imgs.max() > 1.5:
            imgs = imgs / 255.0
        if imgs.ndim == 4:
            imgs = imgs.mean(axis=-1)
        labels = labels.reshape(-1)
    else:
        imgs, labels = _texture_fallback(side, name)
    return _finish(imgs, labels, n_classes, ds_size, side, side)


def bloodmnist_28x28(n_classes=8, ds_size=500):
    return _medmnist("bloodmnist", 28, n_classes, ds_size)


def PneumoniaMNIST_28x28(n_classes=2, ds_size=500):
    return _medmnist("pneumoniamnist", 28, n_classes, ds_size)


def pathmnist_28x28(n_classes=9, ds_size=500):
    return _medmnist("pathmnist", 28, n_classes, ds_size)


def fruit_64x64(n_classes=10, ds_size=500):
    return _medmnist("fruit360", 64, n_classes, ds_size)


def logo2kplus_28x28(n_classes=10, ds_size=500):
    return _medmnist("logo2kplus", 28, n_classes, ds_size)


def xray_64x64(n_classes=2, ds_size=500):
    return _medmnist("xray", 64, n_classes, ds_size)


ALL_LOADERS = {
    name: fn for name, fn in list(globals().items())
    if callable(fn) and not name.startswith("_") and name not in (
        "DATA_DIR", "ALL_LOADERS")
}
