#!/usr/bin/env python
"""Head-to-head on ALL 34 shipped EMNIST checkpoints (results/emnist.zip).

The reference's main-paper experiment (src/emnist_exm.py:206-250) trained 5
model families x 7 EMNIST-letters labels {2,14,18,21,22,23,25} for 50 epochs
with the "noise" prediction goal and shipped the trained torch checkpoints.
This tool closes the last unscored body of reference evidence (VERDICT r2
item 1):

  column A ("reference"): import every shipped checkpoint
    (ckpt.load_reference_checkpoint), sample with OUR sampler under the
    emnist protocol (tau_test=5, first_x = rand(10)*0.75+0.5), score
    SSIM/PSNR/cos at (gen=1, real=20) vs the label's test split
    (reference src/emnist_exm.py:430-450).
  column B ("ours"): train OUR models at the identical configs (same
    family hyperparameters, lr, tau=10, batch_size=1, epochs=50,
    target=noise), all 7 labels simultaneously in one vmapped program per
    family, and score identically.

DATA NOTE: real EMNIST is not on disk in this offline environment; both
columns are scored against the SYNTHETIC font-rendered letters stand-in
(qiddm_tpu/data.py::_letters_fallback, loudly warned), and column B trains
on it. The reference checkpoints carry their real-handwriting training
distribution, so column A is disadvantaged on stylistic match; the JSON
and QUALITY.md label this explicitly. Drop real EMNIST idx files in
$QIDDM_DATA_DIR to rerun on real data.

Usage: python tools/score_emnist_checkpoints.py [--skip-train] [--epochs N]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import pathlib
import sys
import time
import warnings
import zipfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

# --cpu pins the CPU backend (the axon sitecustomize overrides the env var
# alone; config.update after import is required — see tests/conftest.py)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

ZIP = pathlib.Path("/root/reference/results/emnist.zip")
LABELS = [2, 14, 18, 21, 22, 23, 25]

# family -> (ctor name, ctor args, shipped file prefix, reference lr flag)
# ctor args verified against tests/test_import_reference.py; lrs from
# reference src/emnist_exm.py:128-136 (differN_old_pca and QNN have no
# dedicated flag there; the nearest family flag is used, as the reference
# driver's getattr(args, f"{model_name}_lr") would require).
FAMILIES = {
    "QIDDM_PL_noise": dict(
        ctor="QIDDM_PL_noise", args=(784, 8, 6, 2, 0),
        prefix="QIDDM_PL_noise=8_L=6_N=2", lr=0.001852),
    "QDense": dict(
        ctor="QDenseUndirected_old_noise", args=(60, 28, 0),
        prefix="QDenseUndirected_old_noise60_w28_h28_noise0", lr=0.00211),
    "QNN": dict(
        ctor="QNN", args=(784, 8, 6),
        prefix="QNN_linear_features=8_qdepth=6_add_noise=0", lr=0.01011),
    "differN_old_pca": dict(
        ctor="differN_old_pca", args=(28, 15, 2),
        prefix="differN_old_pca=15_N=2_w28_h28_noise0", lr=0.00917),
    "UNet": dict(
        ctor="UNetUndirected", args=(3, 8, 0),
        prefix="unet_undirected_d3_s8_d0", lr=0.00641,
        kwargs={"img_shape": (28, 28)}),
}

TAU_TEST = 5          # reference src/emnist_exm.py:203
TAU_TRAIN = 10        # --tau default
GEN_COUNT, REAL_COUNT = 1, 20   # src/emnist_exm.py:441-455


def load_data():
    from qiddm_tpu import data

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x, y, h, w = data.emnist_28x28(n_classes=26, ds_size=1300)
    splits = {}
    for lab in LABELS:
        xl = x[y == lab].astype(np.float32)
        cutoff = int(len(xl) * 0.8)
        splits[lab] = (xl[:cutoff], xl[cutoff:])
    return splits


def prep_real(x_test):
    """Reference real-image scaling (src/emnist_exm.py:219-231): per-image
    min-max to [0,1] then x255 + clamp."""
    real = np.asarray(x_test).reshape(-1, 1, 28, 28)
    rmin = real.reshape(len(real), -1).min(1)[:, None, None, None]
    rmax = real.reshape(len(real), -1).max(1)[:, None, None, None]
    real = (real - rmin) / (rmax - rmin + 1e-7)
    return np.clip(real * 255.0, 0.0, 255.0)


def score_stack(stack, real):
    """stack: (iters+1, b, 1, h, w) raw sampler output in [0,1]-ish."""
    from qiddm_tpu import metrics

    gen = np.clip(np.clip(np.asarray(stack), 0.0, 1.0) * 255.0, 0.0, 255.0)
    return {
        "ssim": float(metrics.ssim_iterations(
            gen, real, GEN_COUNT, REAL_COUNT)[-1]),
        "psnr": float(metrics.psnr_iterations(
            gen, real, GEN_COUNT, REAL_COUNT)[-1]),
        "cos": float(metrics.cosine_iterations(
            gen, real, GEN_COUNT, REAL_COUNT)[-1]),
    }


def build_net(fam, seed=42, init_batch=None):
    import inspect

    from qiddm_tpu import nn

    spec = FAMILIES[fam]
    ctor = getattr(nn, spec["ctor"])
    kwargs = dict(spec.get("kwargs", {}))
    kwargs["seed"] = seed
    if (init_batch is not None
            and "init_batch" in inspect.signature(ctor.__init__).parameters):
        kwargs["init_batch"] = init_batch
    return ctor(*spec["args"], **kwargs)


def first_x_ref(seed=42):
    import jax

    # our convention (cli/common.make_first_x): uniform*0.75+0.5, 10 images
    return jax.random.uniform(
        jax.random.PRNGKey(seed + 1), (10, 1, 28, 28)) * 0.75 + 0.5


def score_reference_column(splits):
    import jax

    from qiddm_tpu.ckpt import load_reference_checkpoint
    from qiddm_tpu.diffusion import Diffusion

    out = {}
    # one jitted sampler per family (the axon TPU backend cannot run the
    # sampler eagerly, and jitting amortizes the compile across labels)
    samplers = {}
    with zipfile.ZipFile(ZIP) as zf:
        members = {n: n for n in zf.namelist() if n.endswith(".pt")}
        for fam, spec in FAMILIES.items():
            out[fam] = {}
            for lab in LABELS:
                member = next(
                    (n for n in members
                     if n.endswith(f"{spec['prefix']}_noise_{lab}.pt")), None)
                if member is None:   # emnist18 ships no UNet checkpoint
                    continue
                x_train, x_test = splits[lab]
                blob = zf.read(member)
                tmp = pathlib.Path("/tmp/_emnist_ckpt.pt")
                tmp.write_bytes(blob)
                net = build_net(fam, init_batch=x_train[:32].reshape(
                    -1, 1, 28, 28))
                losses, epochs = load_reference_checkpoint(net, tmp)
                diff = Diffusion(net=net, prediction_goal="noise",
                                 shape=(28, 28)).eval()
                if fam not in samplers:
                    samplers[fam] = jax.jit(
                        lambda v, fx, d=diff: d.sample_stack_fn(
                            v, fx, TAU_TEST))
                stack = samplers[fam](net.variables, first_x_ref())
                s = score_stack(stack, prep_real(x_test))
                s["epochs_in_ckpt"] = int(epochs)
                s["final_train_loss"] = (float(losses[-1])
                                         if losses else None)
                out[fam][str(lab)] = s
                print(f"[ref] {fam} label {lab}: {json.dumps(s)}", flush=True)
    return out


def train_ours_column(splits, epochs, families=None, on_family_done=None):
    """Train all 7 labels of each family in ONE vmapped program.

    ``families``: optional subset of FAMILIES keys. ``on_family_done``:
    callback(fam, scores) — used for incremental artifact writes so a
    timeout loses at most one family."""
    import jax
    import jax.numpy as jnp
    import optax

    from qiddm_tpu.diffusion import Diffusion

    out = {}
    n_min = min(len(tr) for tr, _ in splits.values())
    stacked_train = jnp.asarray(
        np.stack([splits[lab][0][:n_min] for lab in LABELS]), jnp.float32)
    fx = first_x_ref()

    for fam, spec in FAMILIES.items():
        if families and fam not in families:
            continue
        t0 = time.time()
        proto = build_net(fam, init_batch=np.asarray(
            stacked_train[0][:32]).reshape(-1, 1, 28, 28))
        module = proto.module
        diff = Diffusion(net=proto, prediction_goal="noise", shape=(28, 28))

        nb = max(2, min(32, n_min))
        dummies = stacked_train[:, :nb].reshape(len(LABELS), -1, 1, 28, 28)
        keys = jnp.stack([jax.random.PRNGKey(42 + lab) for lab in LABELS])
        stacked_vars = jax.jit(jax.vmap(
            lambda k, d: module.init(k, d, train=False)))(keys, dummies)
        params = stacked_vars["params"]
        extra = {k: v for k, v in stacked_vars.items() if k != "params"}

        optimizer = optax.adam(spec["lr"])
        opt_state = jax.jit(jax.vmap(optimizer.init))(params)
        run = diff.make_multi_epoch_fn(optimizer, TAU_TRAIN, 1, epochs)
        vrun = jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0, 0, None)),
                       static_argnums=(5,))
        tkeys = jax.random.split(jax.random.PRNGKey(42), len(LABELS))
        params, opt_state, extra, losses = vrun(
            params, opt_state, extra, tkeys, stacked_train, n_min)
        losses = np.asarray(losses)

        def one_sample(p, e):
            return diff.sample_stack_fn({"params": p, **e}, fx, TAU_TEST)

        stacks = np.asarray(jax.jit(jax.vmap(one_sample))(params, extra))
        out[fam] = {}
        for i, lab in enumerate(LABELS):
            s = score_stack(stacks[i], prep_real(splits[lab][1]))
            s["final_train_loss"] = float(losses[i][-1])
            out[fam][str(lab)] = s
        print(f"[ours] {fam}: {epochs} epochs x {len(LABELS)} labels in "
              f"{time.time() - t0:.1f}s "
              f"(ssim: {[round(out[fam][str(l)]['ssim'], 3) for l in LABELS]})",
              flush=True)
        if on_family_done is not None:
            on_family_done(fam, out[fam])
    return out


def compute_summary(ref_all, ours_all):
    """Per-family mean-SSIM table over the labels BOTH columns scored
    (single definition: the scoring path and --merge recompute must agree;
    ``wins`` counts ours >= ref, ties included)."""
    summary = {}
    for fam in FAMILIES:
        ref, ours = ref_all.get(fam, {}), ours_all.get(fam, {})
        common = sorted(set(ref) & set(ours))
        if not common:
            continue
        summary[fam] = {
            "labels": common,
            "ref_mean_ssim": float(np.mean(
                [ref[l]["ssim"] for l in common])),
            "ours_mean_ssim": float(np.mean(
                [ours[l]["ssim"] for l in common])),
            "wins": sum(ours[l]["ssim"] >= ref[l]["ssim"]
                        for l in common),
        }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--families", type=str, default=None,
                    help="comma-separated FAMILIES subset")
    ap.add_argument("--epochs", type=int, default=50,
                    help="epochs for column B (shipped ckpts record 50)")
    ap.add_argument("--out", type=str,
                    default="results/emnist_head_to_head.json",
                    help="output json (per-family parallel runs write "
                         "separate files, merged by --merge)")
    ap.add_argument("--merge", type=str, nargs="*", default=None,
                    help="merge these per-family jsons into --out and "
                         "recompute the summary; no scoring")
    args = ap.parse_args()

    if args.merge is not None:
        merged = {}
        for mp in args.merge:
            part = json.loads(pathlib.Path(mp).read_text())
            for key in ("reference_checkpoints", "ours_trained"):
                if key in part:
                    merged.setdefault(key, {}).update(part[key])
            if "protocol" in part:
                merged.setdefault("protocol", part["protocol"])
        out_path = pathlib.Path(args.out)
        if out_path.exists():
            base = json.loads(out_path.read_text())
            for key in ("reference_checkpoints", "ours_trained"):
                if key in merged:
                    base.setdefault(key, {}).update(merged[key])
                    # point merged at the UNION so the final base.update
                    # can't clobber families already present in --out
                    merged[key] = base[key]
                elif key in base:
                    merged[key] = base[key]
            base.update({k: v for k, v in merged.items()})
            merged = base
        summary = compute_summary(merged.get("reference_checkpoints", {}),
                                  merged.get("ours_trained", {}))
        merged["summary"] = summary
        out_path.write_text(json.dumps(merged, indent=2))
        print(json.dumps(summary, indent=2))
        print(f"merged -> {out_path}")
        return

    splits = load_data()
    result = {
        "protocol": {
            "tau_test": TAU_TEST, "gen_count": GEN_COUNT,
            "real_count": REAL_COUNT, "target": "noise",
            "train_config": {"tau": TAU_TRAIN, "batch_size": 1,
                             "epochs": args.epochs,
                             "lrs": {f: FAMILIES[f]["lr"] for f in FAMILIES}},
            "data": "SYNTHETIC font-rendered letters stand-in "
                    "(qiddm_tpu.data._letters_fallback) — real EMNIST is "
                    "not available offline; see tool docstring",
            "split_sizes": {str(l): [int(len(splits[l][0])),
                                     int(len(splits[l][1]))]
                            for l in LABELS},
        },
    }
    path = pathlib.Path(args.out)
    if path.exists():
        old = json.loads(path.read_text())
        result.update({k: v for k, v in old.items() if k != "protocol"})
    fams = args.families.split(",") if args.families else None
    if not args.skip_ref:
        result["reference_checkpoints"] = score_reference_column(splits)

    def incr_write(fam, scores):
        # incremental write: a timeout loses at most one family
        result.setdefault("ours_trained", {})[fam] = scores
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(result, indent=2))

    if not args.skip_train:
        trained = train_ours_column(splits, args.epochs, families=fams,
                                    on_family_done=incr_write)
        result.setdefault("ours_trained", {}).update(trained)

    # per-family means for the QUALITY.md table
    if "reference_checkpoints" in result and "ours_trained" in result:
        summary = compute_summary(result["reference_checkpoints"],
                                  result["ours_trained"])
        result["summary"] = summary
        print(json.dumps(summary, indent=2))

    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(result, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
