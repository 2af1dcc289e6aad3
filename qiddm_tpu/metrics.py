"""Image metrics: SSIM / PSNR / cosine / pixel-space FID + plot helpers.

Reference: src/metrics.py. The reference scores with skimage's
``structural_similarity`` / ``peak_signal_noise_ratio``, a hand-rolled cosine
mapped to [0,1], and a pixel-space Fréchet distance (NOT Inception-FID —
reference src/metrics.py:345-356, SURVEY §8.10). skimage is not available
here, so SSIM/PSNR are implemented from scratch with skimage's exact
defaults (win_size=7 uniform filter, K1=0.01, K2=0.03, unbiased covariance,
edge crop) and validated against golden values in tests.

The hot paths are jitted/vmapped: the reference's O(iters x gen x real)
Python pair loops become one batched computation.
"""

from __future__ import annotations

import functools
import pathlib
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# SSIM (skimage structural_similarity semantics)
# ---------------------------------------------------------------------------

def _valid_mean7(img):
    """7x7 uniform filter, valid region only (equals skimage's crop).
    Integral-image formulation: pure cumsum + slicing, vmaps cleanly."""
    c = jnp.cumsum(jnp.cumsum(img, axis=-2), axis=-1)
    c = jnp.pad(c, ((1, 0), (1, 0)))
    s = c[7:, 7:] - c[:-7, 7:] - c[7:, :-7] + c[:-7, :-7]
    return s / 49.0


def ssim_pair(im1, im2, data_range):
    """SSIM of two 2-D images, matching skimage defaults:
    win_size=7, uniform windows, K1=0.01, K2=0.03, unbiased covariance,
    result averaged over the valid (cropped) region."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    NP = 49.0
    cov_norm = NP / (NP - 1.0)
    ux = _valid_mean7(im1)
    uy = _valid_mean7(im2)
    uxx = _valid_mean7(im1 * im1)
    uyy = _valid_mean7(im2 * im2)
    uxy = _valid_mean7(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    R = data_range.astype(jnp.float32) if hasattr(data_range, "astype") \
        else jnp.float32(data_range)
    C1 = (0.01 * R) ** 2
    C2 = (0.03 * R) ** 2
    A1 = 2.0 * ux * uy + C1
    A2 = 2.0 * vxy + C2
    B1 = ux * ux + uy * uy + C1
    B2 = vx + vy + C2
    return jnp.mean((A1 * A2) / (B1 * B2))


@functools.partial(jax.jit, static_argnames=())
def _ssim_grid(gen, real):
    """gen: (I, G, H, W); real: (R, H, W). data_range per generated image
    (reference src/metrics.py:237). Returns per-iteration mean SSIM (I,)."""

    def one_pair(g, r):
        dr = g.max() - g.min()
        return ssim_pair(g, r, dr)

    per_gen = jax.vmap(lambda g: jax.vmap(lambda r: one_pair(g, r))(real))
    vals = jax.vmap(per_gen)(gen)  # (I, G, R)
    return vals.mean(axis=(1, 2))


def ssim_iterations(generated_images, real_images, gen_img_count=None,
                    real_img_count=None):
    """Mean SSIM per denoise iteration.

    generated_images: (iters, n_gen, 1, H, W); real_images: (n_real, 1, H, W).
    Mirrors the pair-loop in reference src/metrics.py:230-242.
    """
    gen = jnp.asarray(generated_images)[:, :, 0]
    real = jnp.asarray(real_images)[:, 0]
    if gen_img_count is not None:
        gen = gen[:, :gen_img_count]
    if real_img_count is not None:
        real = real[:real_img_count]
    return np.asarray(_ssim_grid(gen, real))


def get_ssim_single(generated_images, real_images, args=None,
                    gen_img_count=None, real_img_count=None):
    """Reference src/metrics.py:250-272: SSIM against the FIRST real image
    only (the Ray-sweep metric)."""
    gen = jnp.asarray(generated_images)[:, :, 0]
    real = jnp.asarray(real_images)[:1, 0]
    if gen_img_count is not None:
        gen = gen[:, :gen_img_count]
    vals = _ssim_grid(gen, real)
    return [float(v) for v in np.asarray(vals)]


# ---------------------------------------------------------------------------
# PSNR
# ---------------------------------------------------------------------------

def psnr_pair(im_true, im_test, data_range):
    err = jnp.mean((im_true.astype(jnp.float32)
                    - im_test.astype(jnp.float32)) ** 2)
    R = jnp.float32(data_range)
    return 10.0 * jnp.log10((R * R) / err)


@jax.jit
def _psnr_grid(gen, real):
    def one_pair(g, r):
        dr = g.max() - g.min()
        return psnr_pair(r, g, dr)

    per_gen = jax.vmap(lambda g: jax.vmap(lambda r: one_pair(g, r))(real))
    vals = jax.vmap(per_gen)(gen)
    return vals.mean(axis=(1, 2))


def psnr_iterations(generated_images, real_images, gen_img_count=None,
                    real_img_count=None):
    gen = jnp.asarray(generated_images)[:, :, 0]
    real = jnp.asarray(real_images)[:, 0]
    if gen_img_count is not None:
        gen = gen[:, :gen_img_count]
    if real_img_count is not None:
        real = real[:real_img_count]
    return np.asarray(_psnr_grid(gen, real))


# ---------------------------------------------------------------------------
# cosine similarity mapped to [0, 1]
# ---------------------------------------------------------------------------

@jax.jit
def _cos_grid(gen, real):
    g = gen.reshape(gen.shape[0], gen.shape[1], -1)
    r = real.reshape(real.shape[0], -1)
    num = jnp.einsum("igp,rp->igr", g, r, precision="highest")
    gn = jnp.linalg.norm(g, axis=-1)[:, :, None]
    rn = jnp.linalg.norm(r, axis=-1)[None, None, :]
    cos = num / (gn * rn)
    return (0.5 + 0.5 * cos).mean(axis=(1, 2))


def cosine_iterations(generated_images, real_images, gen_img_count=None,
                      real_img_count=None):
    """Reference src/metrics.py:162-209 (``0.5 + 0.5 * cos``)."""
    gen = jnp.asarray(generated_images)[:, :, 0]
    real = jnp.asarray(real_images)[:, 0]
    if gen_img_count is not None:
        gen = gen[:, :gen_img_count]
    if real_img_count is not None:
        real = real[:real_img_count]
    return np.asarray(_cos_grid(gen, real))


# ---------------------------------------------------------------------------
# pixel-space FID
# ---------------------------------------------------------------------------

def calculate_fid(act1, act2, n1=None, n2=None):
    """Pixel-space Fréchet distance (reference src/metrics.py:345-356):
    mean/cov of raw flattened pixels, scipy sqrtm on the host."""
    from scipy.linalg import sqrtm

    act1 = np.asarray(act1).reshape(n1 or len(act1), -1)
    act2 = np.asarray(act2).reshape(n2 or len(act2), -1)
    mu1, sigma1 = act1.mean(axis=0), np.cov(act1, rowvar=False)
    mu2, sigma2 = act2.mean(axis=0), np.cov(act2, rowvar=False)
    ssdiff = np.sum((mu1 - mu2) ** 2.0)
    covmean = sqrtm(sigma1.dot(sigma2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(ssdiff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def fid_iterations(generated_images, real_images, gen_img_count=None,
                   real_img_count=None):
    gen = np.asarray(generated_images)
    real = np.asarray(real_images)
    if gen_img_count is not None:
        gen = gen[:, :gen_img_count]
    if real_img_count is not None:
        real = real[:real_img_count]
    out = []
    for it in range(gen.shape[0]):
        out.append(calculate_fid(gen[it], real, gen.shape[1], real.shape[0]))
    return np.asarray(out)


# ---------------------------------------------------------------------------
# reference-compatible dict-based API + plotting (src/metrics.py)
# ---------------------------------------------------------------------------

def map_model_name(model_name):
    """Paper-name mapping (reference src/metrics.py:24-59)."""
    mapping = {
        "UNetUndirected": "U-net",
        "differN_noise": "QIDDMA",
        "QDenseUndirected_old_noise": "Qdense",
        "QIDDM_PL_noise": "QIDDML",
        "QNN_noise": "QNN",
    }
    if model_name is None:
        return model_name
    if model_name in mapping:
        return mapping[model_name]
    low = model_name.lower()
    if "differn" in low:
        return "QIDDMA"
    if "qdenseundirected" in low:
        return "Qdense"
    if "qiddm_pl" in low:
        return "QIDDML"
    if "qnn" in low:
        return "QNN"
    if "unet_undirected" in low:
        return "U-net"
    return model_name


def _dict_metric(metric_fn, generated_images_dict, real_images_dict, args,
                 gen_img_count, real_img_count, name, **plot_kw):
    values = {}
    model_name = None
    for model_name, gen in generated_images_dict.items():
        real = real_images_dict[model_name]
        vals = metric_fn(gen, real, gen_img_count, real_img_count)
        values[model_name] = [float(v) for v in vals]
    if args is not None:
        show_metrics(values, name, args, model_name=model_name, **plot_kw)
    return values


def get_ssim(generated_images_dict, real_images_dict, args=None,
             gen_img_count=None, real_img_count=None):
    return _dict_metric(ssim_iterations, generated_images_dict,
                        real_images_dict, args, gen_img_count,
                        real_img_count, "SSIM")


def get_psnr(generated_images_dict, real_images_dict, args=None,
             gen_img_count=None, real_img_count=None):
    return _dict_metric(psnr_iterations, generated_images_dict,
                        real_images_dict, args, gen_img_count,
                        real_img_count, "PSNR")


def get_cosine_similarity(generated_images_dict, real_images_dict, args=None,
                          gen_img_count=None, real_img_count=None):
    return _dict_metric(cosine_iterations, generated_images_dict,
                        real_images_dict, args, gen_img_count,
                        real_img_count, "Cosine Similarity")


def get_fid(generated_images_dict, real_images_dict, args=None,
            gen_img_count=None, real_img_count=None):
    return _dict_metric(fid_iterations, generated_images_dict,
                        real_images_dict, args, gen_img_count,
                        real_img_count, "fid")


def show_metrics(values_dict, name, args, model_name=None, model_params=None,
                 colors=None, legend_labels=None, xlabel=None, ylabel=None,
                 is_loss=False, marker_size=7, line_width=3, x_values=None):
    """Line plot per model (reference src/metrics.py:104-153).

    ``x_values``: explicit x coordinates (e.g. the physical noise
    intensities of a sweep — plotting by list index would distort
    non-uniform grids); default is the index.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = colors or ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
                        "#9467bd", "#7f7f7f"]
    legend_labels = [map_model_name(l) for l in
                     (legend_labels or list(values_dict.keys()))]
    xlabel = xlabel or ("Epochs" if is_loss else "Denoising steps")
    markers = ["o", "s", "^", "d", "x", "*", "+", "v", "<", ">", "p", "h"]
    plt.figure(figsize=(8, 6))
    for idx, (_, values) in enumerate(values_dict.items()):
        kw = dict(linestyle="-", color=colors[idx % len(colors)],
                  linewidth=line_width, label=legend_labels[idx % len(legend_labels)])
        if not is_loss:
            kw.update(marker=markers[idx % len(markers)],
                      markersize=marker_size)
        xs = x_values if x_values is not None else range(len(values))
        plt.plot(xs, values, **kw)
    plt.title(name, fontsize=24)
    plt.xlabel(xlabel, fontsize=22)
    plt.ylabel(ylabel or name, fontsize=22)
    plt.grid(True)
    plt.legend(fontsize=18)
    if args is not None and getattr(args, "save_path", None):
        info = (f"{model_name}_{'_'.join(map(str, model_params))}"
                if model_name and model_params else str(model_name))
        sp = pathlib.Path(args.save_path) / f"{name}_{info}_{args.label}.png"
        sp.parent.mkdir(parents=True, exist_ok=True)
        plt.tight_layout()
        plt.savefig(sp, dpi=300)
        print(f"{name} plot saved to {sp}")
    plt.close()


def show_images(images, num_images=5, img_size=(8, 8), save_path=None):
    """Row of grayscale images (reference src/metrics.py:358-372)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    num = min(num_images, len(images))
    fig, axes = plt.subplots(1, num, figsize=(15, 3))
    if num == 1:
        axes = [axes]
    for i in range(num):
        axes[i].imshow(np.asarray(images[i]).reshape(img_size), cmap="gray")
        axes[i].axis("off")
    if save_path:
        plt.savefig(save_path)
    plt.close(fig)


def print_image_count(folder, label):
    """Reference src/metrics.py:157-159."""
    import glob

    images = glob.glob(f"{folder}/*.png")
    print(f"{label}: {len(images)} images")


def show_histogram(score_dict, metric, args, model_name=None,
                   model_params=None, filename=None):
    """Grouped bar chart across labels (reference src/metrics.py:62-101)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    models = list(score_dict.keys())
    scores = np.array(list(score_dict.values()))
    num_models = len(models)
    num_labels = len(scores[0])
    x = np.arange(num_labels)
    bar_width = 0.5 / num_models
    colors = ["#9FABB9", "#D4E1F5", "#7EA6E0", "#D3E2B7", "#7CB862",
              "#FFCE9F", "#9467bd", "#7f7f7f"]
    plt.figure(figsize=(12, 6))
    for i, model in enumerate(models):
        label = map_model_name(model)
        for j in range(num_labels):
            plt.bar(x[j] + i * bar_width, scores[i, j], width=bar_width,
                    color=colors[i % len(colors)],
                    label=label if j == 0 else "")
    plt.title(f"{metric} of Models Across Labels", fontsize=18)
    plt.xlabel(f"{getattr(args, 'data', '')} Labels" if args is not None
               else "Labels", fontsize=16)
    plt.ylabel(metric, fontsize=16)
    # reference xtick/ylim protocol (src/metrics.py:85-91): 'Label i' ticks
    # centered under each bar group, y capped at 1.1x the max score
    plt.xticks(x + bar_width * (num_models - 1) / 2,
               [f"Label {i}" for i in range(num_labels)], fontsize=14)
    plt.yticks(fontsize=14)
    plt.legend(fontsize=14, markerscale=1.5)
    max_score = np.max(scores) if scores.size else 1.0
    plt.ylim(0, max_score * 1.1)
    if args is not None and getattr(args, "save_path", None):
        info = (f"{map_model_name(model_name)}_{'_'.join(map(str, model_params))}"
                if model_name and model_params else "unknown_model")
        sp = pathlib.Path(args.save_path) / f"{metric}_{info}_{args.label}.png"
        sp.parent.mkdir(parents=True, exist_ok=True)
        plt.tight_layout()
        plt.savefig(sp, dpi=300)
    plt.close()
