#!/usr/bin/env python
"""Sample from the reference's shipped TRAINED checkpoints with OUR sampler.

The rebuttal zips ship trained torch checkpoints
(``QIDDM_PL_noise=8_L=6_N=2_<label>.pt``) next to the training data and the
reference's own generated trajectories. This tool closes the cross-framework
loop (VERDICT r1 task 8): import each checkpoint via
``ckpt.load_reference_checkpoint`` (torch->flax layout mapping), run OUR
denoising sampler from the same first_x convention (tau_test=5, 10 images —
reference src/bloodmnist.py:233-235), and score with the identical rebuttal
protocol. Comparing this column against (a) the reference's shipped
generated samples rescored with our metrics and (b) our own trained models
isolates sampler/model-import fidelity from training differences.

Usage: python tools/score_imported_checkpoints.py   (CPU is fine)
"""

from __future__ import annotations

import io
import json
import os
import pathlib
import sys
import zipfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REF_ZIPS = pathlib.Path("/root/reference/results_rebuttal_complex_dataset")

# member path inside zip -> (cache name, label)
CKPTS = {
    ("medmnist.zip", "medmnist/bloodmnist/QIDDM_PL_noise=8_L=6_N=2_0.pt"):
        ("bloodmnist_28", 0),
    ("medmnist.zip",
     "medmnist/PneumoniaMNIST/QIDDM_PL_noise=8_L=6_N=2_0.pt"):
        ("pneumoniamnist_28", 0),
    ("logo2kplus.zip", "logo2kplus/Ascari/QIDDM_PL_noise=8_L=6_N=2_1.pt"):
        ("logo2kplus_28", 1),
    ("logo2kplus.zip",
     "logo2kplus/Phillips 66/QIDDM_PL_noise=8_L=6_N=2_4.pt"):
        ("logo2kplus_28", 4),
    ("logo2kplus.zip", "logo2kplus/Sanyo/QIDDM_PL_noise=8_L=6_N=2_5.pt"):
        ("logo2kplus_28", 5),
}


def main():
    import torch

    from qiddm_tpu import metrics, nn
    from qiddm_tpu.ckpt import import_torch_state_dict
    from qiddm_tpu.data import DATA_DIR
    from qiddm_tpu.diffusion import Diffusion

    out = {}
    for (zip_name, member), (cache, label) in CKPTS.items():
        with zipfile.ZipFile(REF_ZIPS / zip_name) as zf:
            blob = zf.read(member)
        ckpt = torch.load(io.BytesIO(blob), map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)

        # QIDDM_PL_noise(784, 8, 6, 2) — the shipped rebuttal flagship.
        # PL's PCA down-projection is refit per batch; the checkpoint holds
        # the circuit weights + linear_up.
        tz = np.load(DATA_DIR / f"{cache}.npz")
        x, y = np.asarray(tz["x"], np.float64), np.asarray(tz["y"])
        xl = (x[y == label].astype(np.float32) / 255.0).reshape(-1, 784)
        net = nn.QIDDM_PL_noise(784, 8, 6, 2, 0,
                                init_batch=xl[:32].reshape(-1, 1, 28, 28))
        import_torch_state_dict(net, sd, strict=False)
        diff = Diffusion(net=net, prediction_goal="data", shape=(28, 28))

        key = jax.random.PRNGKey(43)
        first_x = jax.random.uniform(key, (10, 1, 28, 28)) * 0.75 + 0.5
        outp = diff.eval().sample(first_x=first_x, n_iters=5,
                                  only_last=False)
        outp = np.asarray(np.clip(np.asarray(outp), 0.0, 1.0) * 255.0)
        from einops import rearrange

        gen = rearrange(outp, "(i h) (b w) -> i b 1 h w", i=6, h=28, w=28)

        real = xl.reshape(-1, 1, 28, 28) * 255.0
        rmin = real.reshape(len(real), -1).min(1)[:, None, None, None]
        rmax = real.reshape(len(real), -1).max(1)[:, None, None, None]
        real = np.clip((real - rmin) / (rmax - rmin + 1e-7) * 255.0, 0, 255)

        s = metrics.ssim_iterations(gen, real, 10, 20)
        key_name = f"{cache.rsplit('_', 1)[0]}_{label}"
        out[key_name] = {"ssim_last": float(s[-1]),
                         "ssim_best": float(np.max(s)),
                         "epochs_in_ckpt": int(ckpt.get("epochs", 0))}
        print(key_name, json.dumps(out[key_name]))

    path = pathlib.Path("results") / "imported_checkpoint_scores.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
