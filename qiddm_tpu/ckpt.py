"""Checkpoint save/load with the reference's artifact conventions.

Reference: ``torch.save({'model_state_dict', 'loss_values', 'epochs'})`` at
``<save_path>/<save_name()>_<label>.pt`` (src/mnist_exm.py:197-201), per-model
``save_model/load_model`` duplicates (nn/qdense.py:297-307), and
``QIDDM_PP_old`` pickling its fitted PCA into the checkpoint
(nn/qdense.py:1852-1870; our ``pca_state`` collection rides along in the
variables pytree automatically).

Format: a pickle of numpy-ified pytrees (portable, no torch dependency);
``.pt`` extension kept for filename parity with the reference artifacts.
"""

from __future__ import annotations

import pathlib
import pickle
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path, variables, loss_values: List[float], epochs: int,
                    extra: Optional[Dict[str, Any]] = None) -> pathlib.Path:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {
        "model_state_dict": _to_numpy_tree(variables),
        "loss_values": list(loss_values),
        "epochs": int(epochs),
    }
    if extra:
        blob.update(extra)
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    return path


def load_checkpoint(path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_diffusion(diff, save_path, label, loss_values, epochs,
                   backend: str = "pt", async_save: bool = False):
    """Driver-level save (reference src/mnist_exm.py:189-201).

    backend "pt": the reference's pickle layout (artifact parity).
    backend "orbax": the TPU-native production path (SURVEY §5.4) — each
    array a tensorstore, sharded arrays saved without host gathering;
    ``async_save=True`` returns immediately (training never blocks on IO;
    caller keeps the returned checkpointer and joins before exit).
    """
    if backend == "orbax":
        sp = pathlib.Path(save_path) / f"{diff.save_name()}_{label}.orbax"
        return save_orbax(sp, diff.net.variables, loss_values=loss_values,
                          epochs=epochs, async_save=async_save)
    sp = pathlib.Path(save_path) / f"{diff.save_name()}_{label}.pt"
    return save_checkpoint(sp, diff.net.variables, loss_values, epochs)


def import_torch_state_dict(net, state_dict, strict: bool = True):
    """Map a REFERENCE torch ``state_dict`` onto a qiddm_tpu model.

    Supports the checkpoints the reference ships (results/emnist.zip etc.)
    and any produced by its training scripts: the quantum-dense families
    (weights/weights1 + linear_down/linear_up + batchnorm), conv
    down-projections, and the UNet family (Sequential-indexed convs and
    BatchNorms). Tensors convert with the torch->flax layout rules
    (Linear kernels transpose; Conv OIHW -> HWIO).

    Returns the updated variables dict (also assigned to ``net.variables``).
    """
    import copy

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    sd = {}
    for key, v in state_dict.items():
        k = key[4:] if key.startswith("net.") else key
        sd[k] = to_np(v)

    variables = copy.deepcopy(jax.tree_util.tree_map(np.asarray,
                                                     net.variables))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    consumed = set()

    def take(k):
        consumed.add(k)
        return sd[k]

    def set_linear(dst, prefix):
        if f"{prefix}.weight" in sd:
            dst["kernel"] = take(f"{prefix}.weight").T.astype(
                dst["kernel"].dtype)
        if f"{prefix}.bias" in sd and "bias" in dst:
            dst["bias"] = take(f"{prefix}.bias").astype(dst["bias"].dtype)

    def set_conv(dst, prefix):
        if "qweights" in dst:
            # quantum conv: torch QConv2d stores one SEL weight tensor
            dst["qweights"] = take(f"{prefix}.weights").astype(
                dst["qweights"].dtype)
            return
        dst = dst["Conv_0"] if "Conv_0" in dst else dst
        # torch OIHW -> flax HWIO
        dst["kernel"] = take(f"{prefix}.weight").transpose(2, 3, 1, 0).astype(
            dst["kernel"].dtype)
        if f"{prefix}.bias" in sd:
            dst["bias"] = take(f"{prefix}.bias").astype(dst["bias"].dtype)

    def set_bn(pdst, sdst, prefix):
        pdst["scale"] = take(f"{prefix}.weight").astype(pdst["scale"].dtype)
        pdst["bias"] = take(f"{prefix}.bias").astype(pdst["bias"].dtype)
        sdst["mean"] = take(f"{prefix}.running_mean").astype(
            sdst["mean"].dtype)
        sdst["var"] = take(f"{prefix}.running_var").astype(sdst["var"].dtype)
        consumed.add(f"{prefix}.num_batches_tracked")

    # --- quantum-dense families ------------------------------------------
    for wkey in ("weights", "weights1"):
        if wkey in sd and "qweights" in params:
            params["qweights"] = take(wkey).astype(
                params["qweights"].dtype).reshape(params["qweights"].shape)
    if "linear_down.weight" in sd and "linear_down" in params:
        set_linear(params["linear_down"], "linear_down")
    if "linear_up.weight" in sd and "linear_up" in params:
        set_linear(params["linear_up"], "linear_up")
    if "conv_layer.weight" in sd and "conv_down" in params:
        set_conv(params["conv_down"], "conv_layer")
    for bn_src, bn_dst in (("batchnorm", "bn"), ("batch_norm", "pca_bn")):
        if f"{bn_src}.weight" in sd and bn_dst in params:
            set_bn(params[bn_dst], stats[bn_dst], bn_src)

    # --- UNet family -------------------------------------------------------
    # reference Sequential indices: DownBlock net = [conv,bn,relu,conv,bn,
    # relu] -> (0,1,3,4); UpBlock net = [conv,relu,bn,conv,bn,relu] ->
    # (0,2,3,4); up_conv = [Upsample, conv] -> (1,). The simple (S) blocks
    # are net = [QConv2d, BatchNorm] -> (0,1) (reference nn/unet_simple.py).
    for name in list(params):
        if name.startswith("down"):
            i = name[4:]
            blk = f"down_blocks.{i}.net"
            if "qconv" in params[name]:  # SimpleDownBlock
                set_conv(params[name]["qconv"], f"{blk}.0")
                set_bn(params[name]["bn"], stats[name]["bn"], f"{blk}.1")
            else:
                set_conv(params[name]["conv0"], f"{blk}.0")
                set_bn(params[name]["bn0"], stats[name]["bn0"], f"{blk}.1")
                set_conv(params[name]["conv1"], f"{blk}.3")
                set_bn(params[name]["bn1"], stats[name]["bn1"], f"{blk}.4")
        elif name.startswith("up") and name != "up_conv":
            i = name[2:]
            blk = f"up_blocks.{i}"
            if "qconv" in params[name]:  # SimpleUpBlock
                set_conv(params[name]["up_qconv"], f"{blk}.up_conv.1")
                set_conv(params[name]["qconv"], f"{blk}.net.0")
                set_bn(params[name]["bn"], stats[name]["bn"], f"{blk}.net.1")
            else:
                set_conv(params[name]["up_conv"], f"{blk}.up_conv.1")
                set_conv(params[name]["conv0"], f"{blk}.net.0")
                set_bn(params[name]["bn0"], stats[name]["bn0"], f"{blk}.net.2")
                set_conv(params[name]["conv1"], f"{blk}.net.3")
                set_bn(params[name]["bn1"], stats[name]["bn1"], f"{blk}.net.4")
        elif name == "final_conv":
            set_conv(params[name], "final_conv")

    leftover = set(sd) - consumed
    if strict and leftover:
        raise ValueError(f"unmapped reference tensors: {sorted(leftover)}")
    net.variables = variables
    return variables


def _reference_weights_key(net) -> str:
    """The reference's quantum-weight attribute name for this model class:
    every ``QIDDM_*`` class declares ``self.weights1`` EXCEPT
    ``QIDDM_A_sameN`` (``self.weights``); all other families use
    ``self.weights`` (grep-verified over reference nn/qdense.py)."""
    name = type(net).__name__
    if name.startswith("QIDDM") and name != "QIDDM_A_sameN":
        return "weights1"
    return "weights"


def export_torch_state_dict(net, weights_key: str = None,
                            prefix: str = "net.", strict: bool = True):
    """Inverse of :func:`import_torch_state_dict`: emit a reference-named
    torch-style ``state_dict`` (numpy values) from a qiddm_tpu model.

    Completes the round trip — checkpoints trained here can be taken BACK
    to the reference codebase. Layouts invert the torch->flax rules
    (Linear kernels transpose back, Conv HWIO -> OIHW).

    ``prefix`` defaults to ``"net."`` because the reference DRIVERS save
    ``diff.state_dict()`` of the Diffusion wrapper whose model attribute
    is ``self.net`` (src/mnist_exm.py:197-201, load at :315) — its shipped
    checkpoints all carry ``net.``-prefixed keys. Pass ``prefix=""`` for
    the per-model ``Model.load_model`` path, which loads the bare
    ``self.state_dict()`` (reference nn/qdense.py:1862-1870).

    ``weights_key`` names the quantum weight tensor; default (None) picks
    the class-correct reference name via :func:`_reference_weights_key`.

    ``strict`` raises if any param leaf was not exported (e.g. a family
    the mapping does not know), instead of silently dropping weights.
    """
    if weights_key is None:
        weights_key = _reference_weights_key(net)
    variables = jax.tree_util.tree_map(np.asarray, net.variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = {}
    n_exported = [0]  # param leaves actually written (strict accounting)

    def put_linear(src, pre):
        sd[f"{pre}.weight"] = np.asarray(src["kernel"]).T
        n_exported[0] += 1
        if "bias" in src:
            sd[f"{pre}.bias"] = np.asarray(src["bias"])
            n_exported[0] += 1

    def put_conv(src, pre):
        if "qweights" in src:
            sd[f"{pre}.weights"] = np.asarray(src["qweights"])
            n_exported[0] += 1
            return
        src = src["Conv_0"] if "Conv_0" in src else src
        sd[f"{pre}.weight"] = np.asarray(src["kernel"]).transpose(
            3, 2, 0, 1)  # flax HWIO -> torch OIHW
        n_exported[0] += 1
        if "bias" in src:
            sd[f"{pre}.bias"] = np.asarray(src["bias"])
            n_exported[0] += 1

    def put_bn(psrc, ssrc, pre):
        sd[f"{pre}.weight"] = np.asarray(psrc["scale"])
        sd[f"{pre}.bias"] = np.asarray(psrc["bias"])
        sd[f"{pre}.running_mean"] = np.asarray(ssrc["mean"])
        sd[f"{pre}.running_var"] = np.asarray(ssrc["var"])
        sd[f"{pre}.num_batches_tracked"] = np.asarray(0, np.int64)
        n_exported[0] += 2

    if "qweights" in params:
        sd[weights_key] = np.asarray(params["qweights"])
        n_exported[0] += 1
    if "linear_down" in params:
        put_linear(params["linear_down"], "linear_down")
    if "linear_up" in params:
        put_linear(params["linear_up"], "linear_up")
    if "conv_down" in params:
        put_conv(params["conv_down"], "conv_layer")
    for bn_dst, bn_src in (("bn", "batchnorm"), ("pca_bn", "batch_norm")):
        if bn_dst in params:
            put_bn(params[bn_dst], stats[bn_dst], bn_src)

    for name in params:
        if name.startswith("down"):
            i = name[4:]
            blk = f"down_blocks.{i}.net"
            if "qconv" in params[name]:  # SimpleDownBlock
                put_conv(params[name]["qconv"], f"{blk}.0")
                put_bn(params[name]["bn"], stats[name]["bn"], f"{blk}.1")
            else:
                put_conv(params[name]["conv0"], f"{blk}.0")
                put_bn(params[name]["bn0"], stats[name]["bn0"], f"{blk}.1")
                put_conv(params[name]["conv1"], f"{blk}.3")
                put_bn(params[name]["bn1"], stats[name]["bn1"], f"{blk}.4")
        elif name.startswith("up") and name != "up_conv":
            i = name[2:]
            blk = f"up_blocks.{i}"
            if "qconv" in params[name]:  # SimpleUpBlock
                put_conv(params[name]["up_qconv"], f"{blk}.up_conv.1")
                put_conv(params[name]["qconv"], f"{blk}.net.0")
                put_bn(params[name]["bn"], stats[name]["bn"], f"{blk}.net.1")
            else:
                put_conv(params[name]["up_conv"], f"{blk}.up_conv.1")
                put_conv(params[name]["conv0"], f"{blk}.net.0")
                put_bn(params[name]["bn0"], stats[name]["bn0"], f"{blk}.net.2")
                put_conv(params[name]["conv1"], f"{blk}.net.3")
                put_bn(params[name]["bn1"], stats[name]["bn1"], f"{blk}.net.4")
        elif name == "final_conv":
            put_conv(params[name], "final_conv")

    n_total = len(jax.tree_util.tree_leaves(params))
    if strict and n_exported[0] != n_total:
        raise ValueError(
            f"export mapped {n_exported[0]} of {n_total} param leaves — "
            f"unknown layer names in {sorted(params)} (pass strict=False "
            f"to export the known subset)")
    return {prefix + k: v for k, v in sd.items()}


def save_reference_checkpoint(net, path, loss_values=None, epochs: int = 0,
                              weights_key: str = None, prefix: str = "net.",
                              strict: bool = True):
    """Write a reference-compatible torch ``.pt`` checkpoint (the
    ``{'model_state_dict', 'loss_values', 'epochs'}`` dict layout the
    reference drivers save and load, src/mnist_exm.py:197-201,294-323).

    Models holding a fitted PCA (the ``pca_state`` variables collection)
    additionally get a pickled ``sklearn.decomposition.PCA`` under the
    ``pca_state`` checkpoint key, exactly as the reference's
    ``QIDDM_PP.save_model`` writes and its ``load_model`` reads
    (reference nn/qdense.py:1852-1870)."""
    import torch

    # .copy(): jax arrays surface as non-writable numpy views, which torch
    # rejects (from_numpy shares memory)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) if np.ndim(v)
          else torch.tensor(v)
          for k, v in export_torch_state_dict(
              net, weights_key, prefix=prefix, strict=strict).items()}
    out = {"model_state_dict": sd,
           "loss_values": list(loss_values or []),
           "epochs": int(epochs)}
    pca = net.variables.get("pca_state") if hasattr(net, "variables") else None
    if pca:
        import pickle

        from sklearn.decomposition import PCA

        comps = np.asarray(pca["components"])
        obj = PCA(n_components=comps.shape[0])
        obj.components_ = comps.astype(np.float64)
        obj.mean_ = np.asarray(pca["mean"], np.float64)
        obj.n_components_ = comps.shape[0]
        obj.n_features_in_ = comps.shape[1]
        obj.whiten = False
        out["pca_state"] = pickle.dumps(obj)
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(out, path)
    return path


def load_reference_checkpoint(net, path, strict: bool = True):
    """Load a reference torch ``.pt`` checkpoint file into a qiddm_tpu model.

    Returns (loss_values, epochs) like ``load_diffusion``.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    import_torch_state_dict(net, sd, strict=strict)
    if "pca_state" in ckpt and "pca_state" in net.variables:
        import pickle

        obj = pickle.loads(ckpt["pca_state"])
        variables = dict(net.variables)
        variables["pca_state"] = {
            "mean": np.asarray(obj.mean_, np.float32),
            "components": np.asarray(obj.components_, np.float32),
        }
        net.variables = variables
    return ckpt.get("loss_values", []), ckpt.get("epochs", 0)


def load_diffusion(diff, load_path, label,
                   backend: str = "auto",
                   sharding=None) -> Tuple[List[float], int]:
    """Driver-level load; returns (loss_values, start_epoch) and degrades to
    a fresh model when missing (reference src/mnist_exm.py:294-323).

    backend "auto" prefers an ``.orbax`` checkpoint dir, then the ``.pt``
    pickle. ``sharding`` (optional, orbax only): restore arrays directly
    onto a mesh placement (one Sharding for all leaves or a matching
    pytree) without materializing unsharded copies.
    """
    if str(load_path).endswith(".pt"):
        lp = pathlib.Path(load_path)
    else:
        base = pathlib.Path(load_path)
        if backend in ("auto", "orbax"):
            op = base / f"{diff.save_name()}_{label}.orbax"
            if op.exists():
                out = load_orbax(op, like={"variables": diff.net.variables},
                                 sharding=sharding)
                diff.net.variables = out["variables"]
                meta = out.get("meta") or {}
                print(f"{op}\nModel loaded successfully (orbax).\n")
                return meta.get("loss_values", []), meta.get("epochs", 0)
            if backend == "orbax":
                print(f"{op}\nFailed to load model: File not found.\n")
                return [], 0
        lp = base / f"{diff.save_name()}_{label}.pt"
    print(lp)
    try:
        ckpt = load_checkpoint(lp)
    except FileNotFoundError:
        print("Failed to load model: File not found.\n")
        return [], 0
    diff.net.variables = ckpt["model_state_dict"]
    print("Model loaded successfully.\n")
    return ckpt.get("loss_values", []), ckpt.get("epochs", 0)


# --- orbax backend (TPU-native production checkpointing) -------------------

def save_orbax(path, variables, *, loss_values=None, epochs: int = 0,
               opt_state=None, async_save: bool = False):
    """Write an orbax checkpoint of the model variables (+ optional
    optimizer state) — the TPU-native production path (SURVEY §5.4).

    Unlike the ``.pt`` pickles (kept for reference artifact parity), orbax
    stores each array as a tensorstore — sharded arrays save WITHOUT
    gathering to one host, and :func:`load_orbax` can restore directly
    onto a device mesh. Scalar metadata (loss curve, epochs) goes to a
    ``qiddm_meta.json`` sidecar so the orbax tree holds only arrays
    (restore templates never depend on the loss-curve length).
    ``async_save=True`` returns immediately and persists in a background
    thread (call ``wait_until_finished`` on the returned checkpointer) —
    training never blocks on IO.

    Returns the checkpointer (caller may keep it for async completion).
    """
    import json

    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    state = {"variables": variables}
    if opt_state is not None:
        state["opt_state"] = opt_state
    meta = {"loss_values": [float(v) for v in (loss_values or [])],
            "epochs": int(epochs)}
    def _write_meta():
        # sidecar lives NEXT TO the checkpoint dir — writing inside it
        # would pre-create the destination and break orbax's atomic
        # tmp-dir rename
        path.parent.mkdir(parents=True, exist_ok=True)
        pathlib.Path(str(path) + ".meta.json").write_text(json.dumps(meta))

    if async_save:
        import threading
        import types

        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)

        def _commit_then_meta():
            # the sidecar must become visible only AFTER orbax's atomic
            # tmp-dir rename: written before the commit, a crash mid-save
            # would leave a NEW meta (epochs/loss) next to OLD or absent
            # arrays and a later resume would silently skip the
            # un-persisted epochs
            ckptr.wait_until_finished()
            _write_meta()

        err = []

        def _runner():
            try:
                _commit_then_meta()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                err.append(e)

        t = threading.Thread(target=_runner)  # non-daemon: the
        t.start()  # interpreter joins it at exit, so meta always lands

        def _wait():
            # surface background failures (disk full, tensorstore error)
            # to the caller — a silently-failed "preemption safety" save
            # would resume from a much older epoch later
            t.join()
            if err:
                raise err[0]

        return types.SimpleNamespace(wait_until_finished=_wait,
                                     checkpointer=ckptr)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    # StandardCheckpointer commits in a background thread in recent
    # orbax — join so the checkpoint is durable when we return
    ckptr.wait_until_finished()
    _write_meta()
    return ckptr


def load_orbax(path, *, like=None, sharding=None):
    """Restore an orbax checkpoint.

    ``like``: an example state pytree (e.g. ``{"variables":
    net.variables}``) giving dtypes/shapes for the ARRAY keys to restore;
    keys on disk but absent from ``like`` (e.g. ``opt_state``) are left
    out (partial restore). ``sharding``: either one
    ``jax.sharding.Sharding`` applied to every leaf, or a pytree matching
    ``like`` leaf-for-leaf — arrays are restored DIRECTLY onto those
    placements, never materializing unsharded copies on one device.

    Returns {"variables", "meta"[, "opt_state"]}.
    """
    import json

    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    meta_file = pathlib.Path(str(path) + ".meta.json")
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else None
    if like is None:
        out = ocp.StandardCheckpointer().restore(path)
        if meta is not None:
            out["meta"] = meta
        return out

    like = {k: v for k, v in like.items() if k != "meta"}
    if sharding is None or isinstance(sharding, jax.sharding.Sharding):
        target = jax.tree_util.tree_map(
            lambda x: (jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=sharding)
                       if sharding is not None and hasattr(x, "shape")
                       else x),
            like)
    else:
        # per-leaf sharding pytree (matching like's structure)
        target = jax.tree_util.tree_map(
            lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=sh),
            like, sharding)
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    out = ckptr.restore(path, args=ocp.args.PyTreeRestore(
        item=target, restore_args=restore_args, partial_restore=True))
    out = dict(out)
    if meta is not None:
        out["meta"] = meta
    elif "meta" not in out:
        out["meta"] = {"loss_values": [], "epochs": 0}
    return out
