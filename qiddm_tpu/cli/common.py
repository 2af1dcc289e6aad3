"""Shared experiment-driver logic.

Mirrors the near-identical train/test/main loops the reference duplicates
across its nine driver scripts (diff-verified clones, SURVEY §2.1):
argparse surface, per-label train -> sample -> score loop, per-model lr
flags, checkpoint resume, PNG dumps, metric plots. Models and datasets are
resolved through registries instead of the reference's ``eval`` calls
(src/mnist_exm.py:374, :424; SURVEY §5.6).
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import pickle
import sys
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from .. import data as data_mod
from .. import metrics
from .. import nn as nn_mod
from ..ckpt import load_diffusion, save_diffusion
from ..diffusion import Diffusion
from ..logging_utils import initial_log  # noqa: F401  (re-export for drivers)
from ..noise import add_normal_noise_multiple
from ..train import train_diffusion_scan

MODEL_REGISTRY = {
    name: obj
    for name in dir(nn_mod)
    if isinstance(obj := getattr(nn_mod, name), type)
    and issubclass(obj, nn_mod.DenoiserShim)
    and obj is not nn_mod.DenoiserShim
}

DATA_REGISTRY = dict(data_mod.ALL_LOADERS)

# per-model default learning rates (reference src/mnist_exm.py:130-141)
DEFAULT_LRS = {
    "UNetUndirected": 0.01,
    "differN_noise": 0.00914,
    "QDenseUndirected_old_noise": 0.00211,
    "QIDDM_LL_noise": 0.0255,
    "QIDDM_PL_noise": 0.01116,
    "QNN_noise": 0.01011,
}
FALLBACK_LR = 0.01


def build_parser(description: str, *, default_models, default_data: str,
                 default_img_size: int, default_label: int = 0,
                 default_ds_size: int = 500, default_epochs: int = 50,
                 default_batch_size: int = 1, default_tau: int = 10,
                 with_noise_intensity: bool = False,
                 default_save_path: str = "results/run/",
                 default_load_path: str = "results/run/"):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--model", type=str, default=None, nargs="+",
                   action="append",
                   help="Model name and parameters (repeatable); models: "
                        + ", ".join(sorted(MODEL_REGISTRY)))
    p.add_argument("--data", type=str, default=default_data,
                   help="Dataset: " + ", ".join(sorted(DATA_REGISTRY)))
    p.add_argument("--img_size", type=int, default=default_img_size)
    p.add_argument("--label", type=int, default=default_label,
                   help="Label used for training.")
    p.add_argument("--add_noise", type=int, default=0,
                   help="Hardware-noise channel type (1-3; 4 = rotation "
                        "angle error).")
    if with_noise_intensity:
        p.add_argument("--noise_intensity", type=float, default=0.02,
                       help="Channel strength for the noise sweep (0-1).")
    p.add_argument("--reduced_size", type=float, default=1.0)
    p.add_argument("--load-path", type=str, default=default_load_path)
    p.add_argument("--save-path", type=str, default=default_save_path)
    p.add_argument("--n_classes", type=int, default=10)
    p.add_argument("--target", type=str, default="data",
                   help="Generate noise or data.")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--device", type=str, default="tpu",
                   choices=["cpu", "cuda", "tpu"],
                   help="Reference-CLI parity (src/mnist_exm.py device "
                        "select). 'cpu' pins the JAX platform to CPU — "
                        "useful when the TPU tunnel is unreachable; 'cuda' "
                        "and 'tpu' leave JAX on its default backend.")
    p.add_argument("--tau", type=int, default=default_tau)
    p.add_argument("--ds-size", type=int, default=default_ds_size,
                   help="Dataset size. 80%% is used for training.")
    for name, lr in DEFAULT_LRS.items():
        p.add_argument(f"--{name}_lr", type=float, default=lr)
    p.add_argument("--lr", type=float, default=None,
                   help="Override learning rate for all models.")
    p.add_argument("--epochs", type=int, default=default_epochs)
    p.add_argument("--batch_size", type=int, default=default_batch_size)
    p.add_argument("--vmap-labels", action="store_true",
                   help="Train ALL labels simultaneously in one vmapped "
                        "TPU program (the reference loops labels serially).")
    p.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                   help="Capture a JAX device trace of the training run.")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="Also checkpoint every N epochs (preemption safety; "
                        "0 = only at the end like the reference).")
    p.add_argument("--ckpt-backend", type=str, default="pt",
                   choices=["pt", "orbax"],
                   help="Checkpoint format: 'pt' (reference-parity pickles) "
                        "or 'orbax' (TPU-native tensorstores; periodic "
                        "saves run async so training never blocks on IO).")
    p.add_argument("--noise-backend", type=str, default="dm",
                   choices=["dm", "traj"],
                   help="Channel simulation at noisy test time: 'dm' "
                        "(exact density matrix, the reference's "
                        "default.mixed, <= 12 wires) or 'traj' "
                        "(Monte-Carlo statevector trajectories — unbiased, "
                        "O(n_traj 2^w), the only route for wide circuits).")
    p.add_argument("--n-traj", type=int, default=100,
                   help="Trajectory count for --noise-backend traj.")

    orig_parse = p.parse_args

    def parse_args(argv=None, namespace=None):
        args = orig_parse(argv, namespace)
        args.model = ([list(m) for m in args.model] if args.model
                      else [list(m) for m in default_models])
        args.lr_cli = args.lr  # explicit --lr override, before per-model writes
        return args

    p.parse_args = parse_args
    return p


def validate_args(args) -> None:
    """Fail fast on unknown model/dataset names, and honor --device cpu —
    both must happen before any device work, and every driver entry point
    (run_labels, run_labels_vmapped, noise_common.run_noise_sweep) funnels
    through here."""
    _pin_cpu_if_requested(args)
    for m in args.model:
        if m[0] not in MODEL_REGISTRY:
            raise SystemExit(f"unknown model {m[0]!r}; available: "
                             + ", ".join(sorted(MODEL_REGISTRY)))
    if args.data not in DATA_REGISTRY:
        raise SystemExit(f"unknown dataset {args.data!r}; available: "
                         + ", ".join(sorted(DATA_REGISTRY)))


def model_lr(args, model_name: str) -> float:
    # honor an explicit --lr from the CLI only; ``args.lr`` itself is
    # overwritten per model by the drivers, so checking it directly would
    # leak the first model's rate into every later model
    if getattr(args, "lr_cli", None):
        return args.lr_cli
    return getattr(args, f"{model_name}_lr", FALLBACK_LR)


def build_model(model_args: Sequence, seed: int = 0, init_batch=None):
    """Instantiate a registered model from a ['Name', arg, ...] list
    (the reference evals ``nn.<name>(*params)``, src/mnist_exm.py:419-424).

    ``init_batch`` (real training images, (b, 1, h, w)) reaches models whose
    initialization depends on data — the lazily-fitted-PCA family must fit
    on REAL data like the reference (nn/qdense.py:1807-1810)."""
    import inspect

    name = model_args[0]
    if name not in MODEL_REGISTRY:
        raise SystemExit(f"unknown model {name!r}; available: "
                         + ", ".join(sorted(MODEL_REGISTRY)))
    params = [int(a) if isinstance(a, str) and a.isdigit() else a
              for a in model_args[1:]]
    ctor = MODEL_REGISTRY[name]
    kwargs = {"seed": seed}
    if (init_batch is not None
            and "init_batch" in inspect.signature(ctor.__init__).parameters):
        kwargs["init_batch"] = init_batch
    return ctor(*params, **kwargs)


def load_dataset(args):
    loader = DATA_REGISTRY.get(args.data)
    if loader is None:
        raise SystemExit(f"unknown dataset {args.data!r}")
    x, y, h, w = loader(n_classes=args.n_classes, ds_size=args.ds_size)
    return np.asarray(x), np.asarray(y), h, w


def augment_rotation(x_train, y_train, height, width, target_size: int,
                     seed: int = 0):
    """Random +-15 degree rotations until ``target_size`` samples
    (reference src/bloodmnist.py:335-342, :413-460)."""
    from scipy.ndimage import rotate

    n = len(x_train)
    if n >= target_size or n == 0:
        return x_train, y_train
    rng = np.random.default_rng(seed)
    extra_x, extra_y = [], []
    for _ in range(target_size - n):
        i = int(rng.integers(0, n))
        img = x_train[i].reshape(height, width)
        ang = float(rng.uniform(-15, 15))
        rot = rotate(img, ang, reshape=False, order=1, mode="constant")
        extra_x.append(np.clip(rot, 0.0, 1.0).reshape(-1))
        extra_y.append(y_train[i])
    return (np.concatenate([x_train, np.stack(extra_x)]),
            np.concatenate([y_train, np.asarray(extra_y)]))


def with_noise(net, add_noise: int, noise_intensity: Optional[float] = None,
               noise_trajectories: int = 0):
    """Return a shim sharing ``net``'s trained variables but with hardware
    noise injected into the circuit — the functional replacement for the
    reference's test-time device swap to ``default.mixed``
    (src/mnist_noise.py:210-230).

    An explicit ``noise_intensity`` lands in the clone's ``noise_cfg``
    variables collection (nn/core.py::_resolve_noise), so sweeping the
    intensity is a VARIABLE swap — callers may vmap/trace over
    ``variables["noise_cfg"]["intensity"]`` with one compiled program per
    (model, channel kind).

    ``noise_trajectories > 0`` selects the Monte-Carlo trajectory backend
    (sim/trajectories.py) instead of the density matrix — sampling then
    needs ``Diffusion.sample(..., traj_rng=key)``."""
    fields = {f.name for f in dataclasses.fields(net.module)}
    if "add_noise" not in fields:
        return net
    kw = {"add_noise": add_noise}
    if "noise_intensity" in fields:
        kw["noise_intensity"] = noise_intensity
    if "noise_trajectories" in fields and noise_trajectories:
        kw["noise_trajectories"] = noise_trajectories
    new_module = dataclasses.replace(net.module, **kw)
    clone = object.__new__(type(net))
    clone.__dict__.update(net.__dict__)
    clone.module = new_module
    if ("noise_intensity" in fields and noise_intensity is not None
            and add_noise != 0):
        clone.variables = {
            **{k: v for k, v in net.variables.items() if k != "noise_cfg"},
            "noise_cfg": {"intensity": jnp.asarray(float(noise_intensity),
                                                   jnp.float32)},
        }
    else:
        clone.variables = {k: v for k, v in net.variables.items()
                           if k != "noise_cfg"}
    if hasattr(clone, "_apply_cache"):
        del clone.__dict__["_apply_cache"]
    return clone


def make_first_x(args, n: int = 10):
    key = jax.random.PRNGKey(args.seed + 1)
    return jax.random.uniform(
        key, (n, 1, args.img_size, args.img_size)) * 0.75 + 0.5


def train(diff, args, x_train, start_epoch: int, loss_values: List[float]):
    """Reference train() (src/mnist_exm.py:148-203): Adam, remaining epochs,
    checkpoint at <save_path>/<save_name>_<label>.pt.

    Preemption-safe: SIGTERM/SIGINT mid-training is deferred to the next
    segment boundary, where the current state is checkpointed and the
    process exits 128+signum; rerunning the same command resumes from
    that checkpoint (load_model's normal path). A running XLA program
    cannot be interrupted, so ``--checkpoint-every`` bounds both the
    checkpoint interval and the preemption latency — set it well inside
    the preemption grace period on preemptible TPU pods.
    """
    import contextlib
    import signal as _signal

    from ..profiler import device_trace

    print("Training model")
    remaining = args.epochs - start_epoch
    ckpt_every = getattr(args, "checkpoint_every", 0) or 0
    backend = getattr(args, "ckpt_backend", "pt")
    pending_ckptr = None  # last async orbax save, joined before returning

    caught = {"sig": None}

    def _defer_to_boundary(signum, frame):
        caught["sig"] = signum
        print(f"[preempt] caught signal {signum}; checkpointing at the "
              f"next segment boundary", file=sys.stderr)

    prev_handlers = {}
    for s in (_signal.SIGTERM, _signal.SIGINT):
        try:
            prev_handlers[s] = _signal.signal(s, _defer_to_boundary)
        except ValueError:  # not the main thread (e.g. under a test runner)
            pass

    def _join(ckptr):
        if ckptr is not None and hasattr(ckptr, "wait_until_finished"):
            ckptr.wait_until_finished()

    def _save(epochs_done, *, async_save=False):
        # saves target the same path — join the previous in-flight async
        # save first, and (for sync saves) the returned checkpointer too
        nonlocal pending_ckptr
        _join(pending_ckptr)
        pending_ckptr = None
        out = save_diffusion(diff, args.save_path, args.label, loss_values,
                             epochs_done, backend=backend,
                             async_save=async_save)
        if async_save:
            pending_ckptr = out
        else:
            _join(out)

    trace_ctx = (device_trace(args.profile)
                 if getattr(args, "profile", None) else
                 contextlib.nullcontext())
    try:
        with trace_ctx:
            done = start_epoch
            opt_state = None  # threaded across segments: Adam moments persist
            while remaining > 0:
                seg = min(remaining, ckpt_every) if ckpt_every else remaining
                losses, wall, opt_state = train_diffusion_scan(
                    diff, x_train, epochs=seg, batch_size=args.batch_size,
                    lr=args.lr, T=args.tau, warmup=False,
                    key=jax.random.PRNGKey(args.seed + done),
                    opt_state=opt_state, return_opt_state=True)
                loss_values = list(loss_values) + [float(v) for v in losses]
                done += seg
                remaining -= seg
                print(f"trained {seg} epochs in {wall:.3f}s incl. compile "
                      f"({len(x_train) * seg / max(wall, 1e-9):.0f} "
                      f"images/s)")
                if caught["sig"] is not None:
                    # also fires when this was the final segment: the pod's
                    # grace period is running out — checkpoint and exit
                    # instead of proceeding to test/score/next label
                    _save(done)
                    print(f"[preempt] checkpoint saved at epoch {done}/"
                          f"{args.epochs}; rerun the same command to "
                          f"resume", file=sys.stderr)
                    raise SystemExit(128 + caught["sig"])
                if ckpt_every and remaining > 0:
                    # mid-training saves run async under orbax (the next
                    # segment starts while arrays persist in the background)
                    _save(done, async_save=(backend == "orbax"))
    finally:
        for s, h in prev_handlers.items():
            _signal.signal(s, h)
    _save(args.epochs)
    return loss_values


@dataclasses.dataclass(frozen=True)
class ScoreProtocol:
    """Per-driver test()/metric conventions — the reference drivers diverge
    in how they post-process samples before scoring:

    * mnist_exm (src/mnist_exm.py:206-261,471-480): generated per-step
      min-max renormalized to [0,1], real min-max to [0,1], scored vs x_test
      with (gen=5, real=80) and PSNR/cosine alongside SSIM.
    * fashion_exm/emnist_exm (src/fashion_exm.py:216-260,459-468 /
      src/emnist_exm.py:206-250,441-450): generated kept in [0,255] (no
      renorm loop), real min-max then x255+clamp, scored vs x_test with
      (1,10) / (1,20).
    * rebuttal drivers (src/bloodmnist.py:206-288,523-524 and its clones):
      generated kept in [0,255], real from **x_train** min-max x255+clamp,
      SSIM only (PSNR/cos commented out) with (10,20).
    """
    renorm_generated: bool = True
    real_255: bool = False
    real_from_train: bool = False
    gen_count: int = 5
    real_count: int = 80
    psnr_cos: bool = True


MNIST_PROTOCOL = ScoreProtocol()
FASHION_PROTOCOL = ScoreProtocol(False, True, False, 1, 10, True)
EMNIST_PROTOCOL = ScoreProtocol(False, True, False, 1, 20, True)
REBUTTAL_PROTOCOL = ScoreProtocol(False, True, True, 10, 20, False)
# noise drivers (src/mnist_noise.py:240-262,513-526 / fashion_noise clones):
# generated kept in [0,255] (clamp x255, no per-step renorm), real min-max
# then x255+clamp, all four metrics at (gen=1, real=2)
NOISE_PROTOCOL = ScoreProtocol(False, True, False, 1, 2, True)


def test(diff, args, x_train, x_test, first_x, tau_test: int = 15,
         save_images: bool = True, return_grid: bool = False, grid=None,
         protocol: ScoreProtocol = MNIST_PROTOCOL):
    """Reference test() (src/mnist_exm.py:206-291): sample, rescale,
    protocol-dependent renormalize, dump PNGs, return (generated
    (iters,b,1,h,w), real[, grid]). ``grid`` short-circuits sampling with a
    cached sampler output."""
    print("Testing model")
    s = args.img_size
    outp = grid if grid is not None else diff.eval().sample(
        first_x=first_x, n_iters=tau_test, only_last=False)
    raw_grid = outp
    outp = jnp.clip(outp, 0.0, 1.0) * 255.0
    outp = np.asarray(jnp.clip(outp, 0.0, 255.0))

    generated = rearrange(
        outp, "(iters height) (batch width) -> iters batch 1 height width",
        iters=tau_test + 1, height=s, width=s)

    real_src = x_train if protocol.real_from_train else x_test
    real = np.asarray(real_src).reshape(-1, 1, s, s)
    rmin = real.reshape(len(real), -1).min(1)[:, None, None, None]
    rmax = real.reshape(len(real), -1).max(1)[:, None, None, None]
    real = (real - rmin) / (rmax - rmin + 1e-7)
    if protocol.real_255:
        real = np.clip(real * 255.0, 0.0, 255.0)

    gen = generated.copy()
    if protocol.renorm_generated:
        for step in range(gen.shape[0]):
            g = gen[step]
            gmin = g.reshape(len(g), -1).min(1)[:, None, None, None]
            gmax = g.reshape(len(g), -1).max(1)[:, None, None, None]
            gen[step] = (g - gmin) / (gmax - gmin + 1e-7)

    if save_images and args.save_path:
        _dump_images(args, x_train, gen, outp, diff)
    if return_grid:
        return gen, real, raw_grid
    return gen, real


def _dump_images(args, x_train, generated, grid, diff):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = args.img_size
    base = pathlib.Path(args.save_path)
    img0 = base / "image_0"
    img0.mkdir(parents=True, exist_ok=True)
    for i in range(min(len(x_train), 100)):
        plt.imsave(img0 / f"train_image_{i + 1}.png",
                   np.asarray(x_train[i]).reshape(s, s), cmap="gray")
    for i in range(generated.shape[1]):
        folder = base / f"image_{i + 1}"
        folder.mkdir(parents=True, exist_ok=True)
        for j in range(generated.shape[0]):
            plt.imsave(folder / f"step_{j + 1}.png", generated[j, i, 0],
                       cmap="gray")
    plt.imshow(grid, cmap="gray")
    plt.axis("off")
    plt.savefig(base / f"{diff.save_name()}_{args.label}.png")
    plt.close()


def save_outp(diff, args, outp, noise_intensity):
    # traj-backend outputs are statistical estimates — cache them under a
    # distinct suffix so dm and traj runs never serve each other's caches
    tag = ("_traj" if getattr(args, "noise_backend", "dm") == "traj"
           else "")
    sp = (pathlib.Path(args.save_path)
          / f"{diff.save_name()}_outp_{noise_intensity}{tag}.pt")
    sp.parent.mkdir(parents=True, exist_ok=True)
    with open(sp, "wb") as f:
        pickle.dump(np.asarray(outp), f)


def load_outp(diff, load_path, noise_intensity, backend="dm"):
    """Sampler-output cache (reference src/mnist_noise.py:285-308)."""
    tag = "_traj" if backend == "traj" else ""
    lp = (pathlib.Path(load_path)
          / f"{diff.save_name()}_outp_{noise_intensity}{tag}.pt")
    print(lp)
    try:
        with open(lp, "rb") as f:
            out = pickle.load(f)
        print("outp loaded successfully.\n")
        return out
    except FileNotFoundError:
        print("Failed to load outp: File not found.\n")
        return None


def run_labels_vmapped(args, labels, *, tau_test: int = 15,
                       augment_to: Optional[int] = None,
                       protocol: ScoreProtocol = MNIST_PROTOCOL):
    """Train EVERY label's model simultaneously in one vmapped program.

    TPU-first alternative to the reference's serial per-label loop
    (src/mnist_exm.py:354): per-label datasets are truncated to a common
    size and stacked; per-label parameters get independent seeds; one
    compiled program trains them all. Metrics/checkpoints emitted per label
    with the reference conventions.
    """
    import optax

    from ..noise import add_normal_noise_multiple as schedule

    validate_args(args)
    labels = list(labels)
    x_all, y_all, height, width = load_dataset(args)
    per_label = [x_all[y_all == l] for l in labels]
    for l, v in zip(labels, per_label):
        if len(v) == 0:
            raise ValueError(
                f"label {l} has no images in dataset {args.data!r} "
                f"(available labels: {sorted(set(int(v) for v in y_all))})")
    n_min = min(len(v) for v in per_label)
    n_min = max(int(n_min * args.reduced_size), 2)
    cutoff = max(int(n_min * 0.8), 1)
    trains = [p[:n_min][:cutoff] for p in per_label]
    x_test = np.stack([p[:n_min][cutoff:] for p in per_label])
    if augment_to:
        # rebuttal rotation augmentation on the TRAIN split only, AFTER
        # the 80/20 split (serial-path parity: rotated copies must never
        # leak into x_test — reference src/bloodmnist.py:337-342 augments
        # x_train after splitting)
        target = max(augment_to, cutoff)
        trains = [augment_rotation(t, np.full(len(t), l), height, width,
                                   target, args.seed)[0]
                  for l, t in zip(labels, trains)]
        cutoff = target
    x_train = np.stack(trains)
    print(f"vmapped labels {labels}: per-label train {x_train.shape}")
    args.batch_size = min(args.batch_size, cutoff)
    first_x = make_first_x(args)

    all_scores: Dict[str, Dict[str, list]] = {}
    names = [m[0] for m in args.model]
    for mi, model_args in enumerate(args.model):
        model_name = model_args[0]
        # positional keys, like the serial path's model_key: --model may
        # list the same name twice with different parameters
        score_key = (model_name if names.count(model_name) == 1
                     else f"{model_name}#{mi}")
        proto = build_model(model_args, seed=args.seed)
        module = proto.module
        args.lr = model_lr(args, model_name)
        diff = Diffusion(net=proto, noise_f=schedule,
                         prediction_goal=args.target, shape=(height, width))

        nb = max(2, min(32, cutoff))
        # per-label init batches: data-dependent initialization (the
        # lazily-fitted PCA family) must see each label's OWN images,
        # exactly like the serial path
        dummies = jnp.asarray(x_train[:, :nb]).reshape(
            len(labels), -1, 1, height, width)
        keys = jnp.stack([jax.random.PRNGKey(args.seed + l) for l in labels])
        stacked = jax.jit(jax.vmap(
            lambda k, d: module.init(k, d, train=False)))(keys, dummies)
        params = stacked["params"]
        extra = {k: v for k, v in stacked.items() if k != "params"}

        optimizer = optax.adam(args.lr)
        opt_state = jax.jit(jax.vmap(optimizer.init))(params)
        run = diff.make_multi_epoch_fn(optimizer, args.tau, args.batch_size,
                                       args.epochs)
        vrun = jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0, 0, None)),
                       static_argnums=(5,))
        tkeys = jax.random.split(jax.random.PRNGKey(args.seed), len(labels))
        xtr = jnp.asarray(x_train, jnp.float32)
        params, opt_state, extra, losses = vrun(
            params, opt_state, extra, tkeys, xtr, cutoff)
        losses = np.asarray(losses)  # (n_labels, epochs)

        def one_sample(p, e):
            return diff.sample_stack_fn({"params": p, **e}, first_x, tau_test)

        stacks = np.asarray(jax.jit(jax.vmap(one_sample))(params, extra))
        # reference scoring protocol (same as test()): clamp+rescale samples,
        # protocol-dependent per-step min-max normalize; per-image
        # normalize reals
        stacks = np.clip(np.clip(stacks, 0.0, 1.0) * 255.0, 0.0, 255.0)
        if protocol.renorm_generated:
            for t in range(stacks.shape[0]):
                for step in range(stacks.shape[1]):
                    g = stacks[t, step]
                    gmin = g.reshape(len(g), -1).min(1)[:, None, None, None]
                    gmax = g.reshape(len(g), -1).max(1)[:, None, None, None]
                    stacks[t, step] = (g - gmin) / (gmax - gmin + 1e-7)

        scores = {"ssim": [], "psnr": [], "cos": []}
        for i, label in enumerate(labels):
            var_i = {"params": jax.tree_util.tree_map(lambda a: a[i], params),
                     **jax.tree_util.tree_map(lambda a: a[i], extra)}
            proto.variables = var_i
            sp = pathlib.Path(str(args.save_path) + str(label) + "/noise_0")
            if getattr(args, "ckpt_backend", "pt") == "orbax":
                from ..ckpt import save_orbax

                save_orbax(sp / f"{diff.save_name()}_{label}.orbax", var_i,
                           loss_values=[float(v) for v in losses[i]],
                           epochs=args.epochs)
            else:
                from ..ckpt import save_checkpoint

                save_checkpoint(sp / f"{diff.save_name()}_{label}.pt", var_i,
                                [float(v) for v in losses[i]], args.epochs)
            real_src = x_train if protocol.real_from_train else x_test
            real = real_src[i].reshape(
                -1, 1, height, width).astype(np.float32)
            rmin = real.reshape(len(real), -1).min(1)[:, None, None, None]
            rmax = real.reshape(len(real), -1).max(1)[:, None, None, None]
            real = (real - rmin) / (rmax - rmin + 1e-7)
            if protocol.real_255:
                real = np.clip(real * 255.0, 0.0, 255.0)
            gen = stacks[i]
            gc, rc = protocol.gen_count, protocol.real_count
            s = metrics.ssim_iterations(gen, real, gc, rc)
            if protocol.psnr_cos:
                p_ = metrics.psnr_iterations(gen, real, gc, rc)
                c = metrics.cosine_iterations(gen, real, gc, rc)
            else:
                p_ = c = [float("nan")]
            scores["ssim"].append(float(s[-1]))
            scores["psnr"].append(float(p_[-1]))
            scores["cos"].append(float(c[-1]))
            print(f"label {label}: loss {losses[i][0]:.4f}->"
                  f"{losses[i][-1]:.4f} ssim={s[-1]:.4f}")
        all_scores[score_key] = scores
    return all_scores


def _pin_cpu_if_requested(args) -> None:
    """--device cpu: re-pin the JAX platform past the axon sitecustomize
    override (same dance as tests/conftest.py)."""
    if getattr(args, "device", None) != "cpu":
        return
    import warnings

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as e:  # backend already initialized: pin can't apply
        warnings.warn(
            f"--device cpu requested but the JAX platform pin failed "
            f"({e}); continuing on the already-initialized backend")


def run_labels(args, labels, *, augment_to: Optional[int] = None,
               add_noise_range=range(0, 1), tau_test: int = 15,
               protocol: ScoreProtocol = MNIST_PROTOCOL):
    """The reference drivers' main loop (src/mnist_exm.py:334-503): per
    label, load data, split, per model: build -> resume -> train -> test ->
    metrics; plot loss/SSIM/PSNR/cosine curves."""
    validate_args(args)
    if getattr(args, "vmap_labels", False):
        return run_labels_vmapped(args, labels, tau_test=tau_test,
                                  augment_to=augment_to,
                                  protocol=protocol)
    original_save, original_load = args.save_path, args.load_path

    def model_key(i, margs):
        # positional keys: --model may list the same name twice with
        # different parameters
        return f"{margs[0]}" if [m[0] for m in args.model].count(
            margs[0]) == 1 else f"{margs[0]}#{i}"

    all_scores: Dict[str, Dict[str, list]] = {
        model_key(i, m): {"ssim": [], "psnr": [], "cos": []}
        for i, m in enumerate(args.model)}

    for label in labels:
        args.label = label
        print(args)
        args.save_path = original_save + str(label) + "/noise_"
        args.load_path = original_load + str(label) + "/noise_"
        noise_save_path, noise_load_path = args.save_path, args.load_path

        x_all, y_all, height, width = load_dataset(args)
        mask = y_all == label
        x_lab = x_all[mask]
        y_lab = y_all[mask]
        if len(x_lab) == 0:
            raise ValueError(
                f"label {label} has no images in dataset {args.data!r} "
                f"(available labels: {sorted(set(int(v) for v in y_all))})")
        x_lab = x_lab[: int(len(x_lab) * args.reduced_size)]
        y_lab = y_lab[: len(x_lab)]
        print(f"description of dataset: len of x_train: {x_lab.shape}\n")

        cutoff = int(len(x_lab) * 0.8)
        x_train, x_test = x_lab[:cutoff], x_lab[cutoff:]
        y_train = y_lab[:cutoff]
        if augment_to:
            x_train, y_train = augment_rotation(
                x_train, y_train, height, width, augment_to, args.seed)
            print(f"After augmentation, x_train shape: {x_train.shape}")
        first_x = make_first_x(args)

        if args.batch_size > len(x_train):
            print(f"Warning: batch size ({args.batch_size}) is bigger than "
                  f"the data size ({len(x_train)}). Setting batch size to "
                  f"data size.")
            args.batch_size = max(len(x_train), 1)

        for add_noise in add_noise_range:
            print(f"Test for add_noise:{add_noise}")
            args.save_path = noise_save_path + str(add_noise)
            args.load_path = noise_load_path + str(add_noise)
            generated_dict, real_dict, loss_dict = {}, {}, {}
            model_name = model_params = None

            init_batch = x_train[:32].reshape(-1, 1, height, width)
            for mi, model_args in enumerate(args.model):
                model_name = model_args[0]
                model_params = model_args[1:]
                net = build_model(model_args, seed=args.seed,
                                  init_batch=init_batch)
                args.lr_current = args.lr = model_lr(args, model_name)
                print(f"Initialized {model_name} with parameters "
                      f"{model_params}, with {args.lr}")
                diff = Diffusion(
                    net=net, noise_f=add_normal_noise_multiple,
                    prediction_goal=args.target, shape=(height, width))
                print("parameters:%d\n" % net.num_params())

                loss_values, start_epoch = load_diffusion(
                    diff, args.load_path, label,
                    backend=("auto" if getattr(args, "ckpt_backend", "pt")
                             == "pt" else args.ckpt_backend))
                print(f"epoch start from {start_epoch}, "
                      f"left {args.epochs - start_epoch}")
                loss_values = train(diff, args, x_train, start_epoch,
                                    loss_values)
                loss_dict[model_key(mi, model_args)] = loss_values

                generated, real = test(diff, args, x_train, x_test, first_x,
                                       tau_test=tau_test, protocol=protocol)
                dict_key = f"{diff.save_name()}#{mi}"
                generated_dict[dict_key] = generated
                real_dict[dict_key] = real

            metrics.show_metrics(loss_dict, "LOSS", args,
                                 model_name=model_name,
                                 model_params=model_params, is_loss=True)
            gc, rc = protocol.gen_count, protocol.real_count
            ssim_d = metrics.get_ssim(generated_dict, real_dict, args,
                                      gen_img_count=gc, real_img_count=rc)
            print("Last SSIM values:", ssim_d)
            if protocol.psnr_cos:
                psnr_d = metrics.get_psnr(generated_dict, real_dict, args,
                                          gen_img_count=gc, real_img_count=rc)
                cos_d = metrics.get_cosine_similarity(
                    generated_dict, real_dict, args, gen_img_count=gc,
                    real_img_count=rc)
                print("Last PSNR values:", psnr_d)
                print("Last Cosine Similarity values:", cos_d)
            else:  # rebuttal drivers ship SSIM only (src/bloodmnist.py:527+)
                nans = {k: [float("nan")] for k in ssim_d}
                psnr_d, cos_d = nans, nans
            for m, dname in zip(all_scores, ssim_d):
                # both dicts were filled in --model order (positional keys)
                all_scores[m]["ssim"].append(ssim_d[dname][-1])
                all_scores[m]["psnr"].append(psnr_d[dname][-1])
                all_scores[m]["cos"].append(cos_d[dname][-1])
    args.save_path, args.load_path = original_save, original_load
    # cross-label comparison histograms (reference src/mnist_exm.py:498-502)
    if len(list(labels)) > 1 and args.save_path:
        for metric_name in ("ssim", "psnr", "cos"):
            score_dict = {m: all_scores[m][metric_name] for m in all_scores}
            metrics.show_histogram(score_dict, metric_name.upper(), args)
    return all_scores
