"""Benchmark: diffusion training throughput vs the reference baseline.

Reproduces the reference's only quantitative baseline (BASELINE.md): the
tune_results sweep config — QIDDM-A (differN family) on MNIST-28, label 4,
ds_size=500 (~40 train images), tau=10, 30 epochs, batch 8 — which the
reference trains at ~2.3 images/s (~26 denoiser fwd+bwd steps/s) on a laptop
CPU. Here the whole 30-epoch run is one compiled TPU program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N/2.3}
"""

import json
import sys
import time

REFERENCE_IMAGES_PER_SEC = 2.3  # BASELINE.md derived throughput


def main(epochs: int = 30, batch_size: int = 8, tau: int = 10,
         L: int = 9, N: int = 2):
    import jax

    from qiddm_tpu import data, nn
    from qiddm_tpu.diffusion import Diffusion
    from qiddm_tpu.train import train_diffusion_scan
    x, y, h, w = data.mnist_28x28(n_classes=10, ds_size=500)
    x = x[y == 4]
    n_train = int(len(x) * 0.8)
    x = x[:n_train]

    # QIDDM-A = differN family, L=9, N=2 (the tune_results config)
    net = nn.differN_noise(28, L, N, 0)
    diff = Diffusion(net=net, prediction_goal="data", shape=(h, w))

    t0 = time.time()
    losses, wall = train_diffusion_scan(
        diff, x, epochs=epochs, batch_size=batch_size, lr=0.0459, T=tau,
        key=jax.random.PRNGKey(42))
    setup_s = time.time() - t0 - wall  # compile + one warmup run

    n_images = n_train * epochs
    img_per_s = n_images / wall
    # each image's tau+1-row chain yields tau denoiser fwd+bwd pairs
    steps_per_s = n_images * tau / wall
    result = {
        "metric": "train_images_per_sec_mnist28_qiddm_a",
        "value": round(img_per_s, 1),
        "unit": "images/s",
        "vs_baseline": round(img_per_s / REFERENCE_IMAGES_PER_SEC, 1),
    }
    print(json.dumps(result))
    print(f"# {n_images} images ({n_train} x {epochs} epochs), "
          f"wall={wall:.4f}s, setup={setup_s:.1f}s (compile+warmup), "
          f"denoiser-steps/s={steps_per_s:.0f}, "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f}, "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
