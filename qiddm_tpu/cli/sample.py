"""Standalone sampling / serving driver.

Loads a trained checkpoint and generates images on demand — the inference
path packaged as its own CLI (the reference only samples inside its training
scripts). The sampler is one compiled program; repeated batches reuse it.

  python -m qiddm_tpu.cli.sample --ckpt results/.../QIDDM_LL_noise=6_L=14_N=2_4.pt \
      --model QIDDM_LL_noise 784 6 14 2 --img_size 28 \
      --n 64 --iters 15 --out samples/
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import jax
import numpy as np

from ..ckpt import load_checkpoint
from ..diffusion import Diffusion
from . import common


def parse_args(argv):
    p = argparse.ArgumentParser(description="QDDM sampling / serving")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--model", type=str, nargs="+", default=None,
                   help="Model name and ctor params (as in the training CLI)")
    p.add_argument("--export", type=str, default=None, metavar="PATH",
                   help="write an AOT serving artifact (jax.export "
                        "StableHLO; qiddm_tpu/export.py) for this "
                        "model+ckpt at the given --n/--iters, then exit")
    p.add_argument("--export-platforms", type=str, default=None,
                   help="comma list for cross-platform export, e.g. 'tpu' "
                        "to emit a TPU artifact from a CPU host")
    p.add_argument("--export-batches", type=str, default=None,
                   help="comma list of batch sizes (e.g. '1,8,64') to "
                        "export a BUCKETED bundle instead of the single "
                        "--n batch; --from-export then serves any "
                        "request size")
    p.add_argument("--from-export", type=str, default=None, metavar="PATH",
                   help="serve from an AOT artifact instead of "
                        "--model/--ckpt (no model code or checkpoint "
                        "needed)")
    p.add_argument("--img_size", type=int, default=28)
    p.add_argument("--n", type=int, default=16, help="images to generate")
    p.add_argument("--iters", type=int, default=15, help="denoise iterations")
    p.add_argument("--target", type=str, default="data")
    p.add_argument("--noise_factor", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="samples")
    p.add_argument("--format", choices=["png", "npz", "both"], default="both")
    p.add_argument("--batches", type=int, default=1,
                   help="generate this many batches (throughput reporting)")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="shard each batch over this many devices "
                        "(data-parallel serving; 0 = single device)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(sys.argv[1:] if argv is None else argv)
    s = args.img_size
    sampler = None
    if args.from_export:
        if args.model or args.ckpt:
            raise SystemExit("--from-export replaces --model/--ckpt")
        if args.export:
            raise SystemExit("--export needs --model/--ckpt; it cannot "
                             "re-export a loaded artifact")
        if args.export_batches:
            raise SystemExit("--export-batches selects the bucket ladder "
                             "at export time; a loaded bundle already "
                             "carries its ladder")
        if args.mesh_devices:
            raise SystemExit("--from-export artifacts pin their sharding "
                             "at export time; --mesh-devices does not apply")
        print("note: --iters/--noise_factor were pinned at export time; "
              "the CLI values do not apply to the artifact",
              file=sys.stderr)
        from ..export import is_bundle, load_sampler, load_sampler_bundle

        blob = pathlib.Path(args.from_export).read_bytes()
        # loaders return already-jitted callables with weights as runtime
        # arguments; an outer jax.jit would re-bake them as constants
        sampler = (load_sampler_bundle(blob) if is_bundle(blob)
                   else load_sampler(blob))
        diff = None
    else:
        if not (args.model and args.ckpt):
            raise SystemExit("need --model and --ckpt (or --from-export)")
        if args.export_batches and not args.export:
            raise SystemExit("--export-batches selects the bucket ladder "
                             "of an AOT bundle; it needs --export PATH")
        net = common.build_model(list(args.model), seed=args.seed)
        if (str(args.ckpt).endswith(".orbax")
                or pathlib.Path(args.ckpt).is_dir()):
            from ..ckpt import load_orbax

            net.variables = load_orbax(
                args.ckpt, like={"variables": net.variables})["variables"]
        else:
            ckpt = load_checkpoint(args.ckpt)
            net.variables = ckpt["model_state_dict"]
        diff = Diffusion(net=net, prediction_goal=args.target,
                         shape=(s, s)).eval()

    if args.export:
        from ..export import export_sampler, export_sampler_bundle

        platforms = (tuple(args.export_platforms.split(","))
                     if args.export_platforms else None)
        if args.export_batches:
            batches = [int(b) for b in args.export_batches.split(",")]
            blob = export_sampler_bundle(
                diff, batches=batches, n_iters=args.iters,
                noise_factor=args.noise_factor, platforms=platforms)
            what = f"bucketed bundle batches={sorted(set(batches))}"
        else:
            blob = export_sampler(diff, batch=args.n, n_iters=args.iters,
                                  noise_factor=args.noise_factor,
                                  platforms=platforms)
            what = f"batch={args.n}"
        pathlib.Path(args.export).write_bytes(blob)
        print(f"exported AOT sampler -> {args.export} "
              f"({len(blob)/1e6:.2f} MB, {what}, "
              f"iters={args.iters}, platforms={platforms or 'current'})")
        return None

    mesh = None
    if args.mesh_devices:
        from ..parallel import make_mesh

        mesh = make_mesh(args.mesh_devices, ("data",))

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    all_imgs = []
    t_first = t_rest = None
    for b in range(args.batches):
        key, sub = jax.random.split(key)
        first_x = jax.random.uniform(sub, (args.n, 1, s, s)) * 0.75 + 0.5
        t0 = time.time()
        if sampler is not None:
            imgs = np.asarray(sampler(first_x))
        else:
            imgs = np.asarray(diff.sample(
                n_iters=args.iters, first_x=first_x, only_last=True,
                noise_factor=args.noise_factor, mesh=mesh))
        dt = time.time() - t0
        if b == 0:
            t_first = dt
        else:
            t_rest = (t_rest or 0) + dt
        all_imgs.append(imgs)
    imgs = np.concatenate(all_imgs)

    if args.format in ("npz", "both"):
        np.savez_compressed(out_dir / "samples.npz", images=imgs)
    if args.format in ("png", "both"):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for i in range(len(imgs)):
            plt.imsave(out_dir / f"sample_{i:04d}.png", imgs[i, 0],
                       cmap="gray")
    iters_note = ("artifact-pinned iters" if sampler is not None
                  else f"{args.iters} iters")
    msg = (f"generated {len(imgs)} images ({iters_note}) -> {out_dir}; "
           f"first batch {t_first:.2f}s (incl compile)")
    if args.batches > 1:
        steady = (args.batches - 1) * args.n / t_rest
        msg += f", steady {steady:.0f} images/s"
    print(msg)
    return imgs


if __name__ == "__main__":
    main()
