"""AOT serving artifacts via ``jax.export`` (serialized StableHLO).

The reference has no deployment story — sampling happens inline in its
training scripts (src/mnist_exm.py:206-291). For production TPU serving,
this module serializes the COMPILED sampler once: shapes pinned static,
one self-contained artifact that reloads and runs with no model code, no
checkpoint, and no retracing (jax.export carries explicit
forward/backward compatibility windows for serialized programs).
Cross-platform lowering lets a CPU build host emit the TPU serving
artifact (``platforms=("tpu",)``).

The trained variables ride INSIDE the artifact but enter the exported
program as ARGUMENTS, not baked constants. Measured reason: baking them
as constants invites XLA to constant-fold the weight→unitary composition
chain, and for wide compose-route circuits (e.g. Qdense at 10 wires)
that produced a program 7x SLOWER than the live sampler (the folder
materializes giant gather/slice constants); with variables as arguments
the exported program is the live program, bit-identical performance,
and the loader partially applies the stored variables — which also
allows hot-swapping retrained weights into an existing artifact
(``load_sampler(blob, variables=...)``).

The loaders return ALREADY-JITTED callables with the variables passed as
runtime arguments on every invocation. Do NOT re-wrap them in
``jax.jit``: an outer jit would close over the weights and re-embed them
as compile-time constants, re-enabling the exact constant-folding
slowdown this format exists to avoid.

Artifacts carry variables pickle-free (raw npz + a JSON key-path table),
so loading an artifact executes no embedded code.

Surface:

* :func:`export_sampler` / :func:`load_sampler` — single batch size
* :func:`export_sampler_bundle` / :func:`load_sampler_bundle` — bucketed
  batch-size ladder serving any request size
* CLI: ``python -m qiddm_tpu.cli.sample --export path.shlo`` /
  ``--from-export path.shlo`` (cli/sample.py)
"""

from __future__ import annotations

import io
import json
import struct
from collections.abc import Mapping as _Mapping

import jax
import jax.numpy as jnp
import numpy as np

_ARTIFACT_MAGIC = b"QSA3"
_BUNDLE_MAGIC = b"QSB3"
# round-3 interim formats, no longer readable: QSA2/QSB2 carried the
# variables as a pickle (arbitrary-code-execution on load of an untrusted
# artifact); QSB1 baked variables as program constants. Nothing shipped
# in these formats — loaders reject them with a re-export pointer.
_RETIRED_MAGICS = (b"QSA2", b"QSB2", b"QSB1")


def _check_exportable(diff):
    if getattr(diff.net.module, "noise_trajectories", 0):
        raise ValueError(
            "trajectory-noise models sample with a fresh traj_rng per call "
            "and cannot be pinned into a fixed AOT artifact; export the "
            "clean model or use the density-matrix backend")


_KEY_TAGS = {
    jax.tree_util.DictKey: "d",
    jax.tree_util.SequenceKey: "s",
}


def _var_blob(variables):
    """Encode a variables pytree (nested dicts/lists of arrays) WITHOUT
    pickle: a JSON table of tagged key-paths + one npz of raw arrays.
    Snapshots to host numpy so later training of the live model cannot
    alter the artifact."""
    # tuples flatten to SequenceKey exactly like lists, but the decoder
    # rebuilds lists — the treedef would silently differ from the one the
    # program was traced with and every call would fail. Reject up front.
    def _no_tuples(node):
        if isinstance(node, tuple):
            raise ValueError(
                "variables tree contains a tuple container; AOT artifacts "
                "store str-keyed dicts and lists only (tuples cannot be "
                "reconstructed distinguishably on load)")
        if isinstance(node, _Mapping):  # dict / flax FrozenDict
            for v in node.values():
                _no_tuples(v)
        elif isinstance(node, list):
            for v in node:
                _no_tuples(v)

    _no_tuples(variables)
    leaves = jax.tree_util.tree_flatten_with_path(variables)[0]
    paths, arrays = [], {}
    for i, (path, leaf) in enumerate(leaves):
        keys = []
        for k in path:
            tag = _KEY_TAGS.get(type(k))
            if tag == "d" and isinstance(k.key, str):
                keys.append(["d", k.key])
            elif tag == "s":
                keys.append(["s", k.idx])
            else:
                raise ValueError(
                    f"variables tree has a non-dict/list container key "
                    f"{k!r}; AOT artifacts store str-keyed dicts and lists "
                    f"only")
        paths.append(keys)
        arrays[f"a{i}"] = np.asarray(leaf)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return paths, buf.getvalue()


def _vars_from_blob(paths, vb):
    if len(paths) == 1 and not paths[0]:  # a single bare array
        with np.load(io.BytesIO(vb), allow_pickle=False) as z:
            return z["a0"]
    # every list slot must hold at least one leaf, so no legitimate
    # sequence index can reach the leaf count — a crafted header index
    # (e.g. 10**9) would otherwise grow the padding list until OOM
    max_idx = len(paths)

    def _seq_get(node, key, nxt):
        if not isinstance(key, int) or not 0 <= key < max_idx:
            raise ValueError(
                f"corrupt artifact: sequence index {key!r} out of range")
        while len(node) <= key:
            node.append(None)
        if node[key] is None:
            node[key] = nxt
        return node[key]

    tree = [] if paths and paths[0] and paths[0][0][0] == "s" else {}
    with np.load(io.BytesIO(vb), allow_pickle=False) as z:
        for i, keys in enumerate(paths):
            node = tree
            for (tag, key), (ntag, nkey) in zip(keys[:-1], keys[1:]):
                nxt = {} if ntag == "d" else []
                if tag == "d":
                    node = node.setdefault(key, nxt)
                else:
                    node = _seq_get(node, key, nxt)
            tag, key = keys[-1]
            if tag == "d":
                node[key] = z[f"a{i}"]
            else:
                _seq_get(node, key, None)
                node[key] = z[f"a{i}"]
    return tree


def _split_var_blob(header, rest):
    """Validate the header's var_len against the payload and split."""
    var_len = header.get("var_len")
    if not isinstance(var_len, int) or not 0 <= var_len <= len(rest):
        raise ValueError(f"corrupt artifact: var_len {var_len!r} outside "
                         f"payload of {len(rest)} bytes")
    return rest[:var_len], rest[var_len:]


def _export_program(diff, variables, *, batch, n_iters, only_last,
                    noise_factor, platforms) -> bytes:
    def fn(variables, first_x):
        return diff.sample_fn(variables, first_x, n_iters,
                              only_last=only_last,
                              noise_factor=noise_factor)

    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        variables)
    x_spec = jax.ShapeDtypeStruct((batch, 1, diff.width, diff.height),
                                  jnp.float32)
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(var_specs,
                                                              x_spec)
    return bytes(exp.serialize())


def _pack(magic: bytes, header: dict, *blobs: bytes) -> bytes:
    h = json.dumps(header).encode()
    return magic + struct.pack("<I", len(h)) + h + b"".join(blobs)


def _unpack(blob: bytes):
    if len(blob) < 8:
        raise ValueError("corrupt artifact: truncated header")
    hlen = struct.unpack("<I", blob[4:8])[0]
    if 8 + hlen > len(blob):
        raise ValueError(f"corrupt artifact: header length {hlen} exceeds "
                         f"blob of {len(blob)} bytes")
    header = json.loads(blob[8:8 + hlen].decode())
    return header, blob[8 + hlen:]


def _reject_retired(blob: bytes):
    if blob[:4] in _RETIRED_MAGICS:
        raise ValueError(
            f"artifact format {blob[:4].decode()} is retired (it embedded "
            f"a pickle / baked constants); re-export with this version")


def export_sampler(diff, *, batch: int, n_iters: int,
                   only_last: bool = True, noise_factor: float = 1.0,
                   platforms=None) -> bytes:
    """Serialize ``diff``'s sampler as a self-contained AOT artifact.

    ``batch``, ``n_iters``, and the image shape are pinned into the
    program (static shapes — the XLA contract; use
    :func:`export_sampler_bundle` for a batch-size ladder).
    ``only_last=True`` emits ``(batch, 1, h, w)`` final images; ``False``
    emits the reference's stacked grid (src/models.py:141-146).
    ``platforms``: e.g. ``("tpu",)`` to emit a TPU artifact from a CPU
    host; default = the current backend.

    Trajectory-noise models need a ``traj_rng`` each call and are not
    exportable as a fixed program — seed-pinned export would silently
    reuse one noise draw; rejected explicitly.
    """
    _check_exportable(diff)
    variables = diff.net.variables
    paths, vb = _var_blob(variables)
    prog = _export_program(diff, variables, batch=batch, n_iters=n_iters,
                           only_last=only_last, noise_factor=noise_factor,
                           platforms=platforms)
    return _pack(_ARTIFACT_MAGIC, {"var_len": len(vb), "var_paths": paths},
                 vb, prog)


def load_sampler(blob: bytes, variables=None):
    """Deserialize an exported sampler into a callable ``first_x -> out``.

    The callable runs the embedded StableHLO through XLA on the current
    backend — no qiddm_tpu model code or checkpoint needed (the artifact
    carries the variables pickle-free). Pass ``variables`` to hot-swap
    retrained weights of the same shapes/dtypes into the program.

    The result is already jit-compiled with the weights as runtime
    arguments; do NOT wrap it in ``jax.jit`` (an outer jit would bake the
    weights back into the program as constants — see module docstring).
    """
    _reject_retired(blob)
    if is_bundle(blob):
        raise ValueError("this is a bucketed bundle artifact; use "
                         "load_sampler_bundle")
    if blob[:4] == _ARTIFACT_MAGIC:
        header, rest = _unpack(blob)
        vb, prog = _split_var_blob(header, rest)
        stored = _vars_from_blob(header["var_paths"], vb)
        call = jax.jit(jax.export.deserialize(bytearray(prog)).call)
        v = stored if variables is None else variables
        v = jax.tree_util.tree_map(jnp.asarray, v)
        return lambda first_x: call(v, first_x)
    if variables is not None:
        raise ValueError("legacy constants-mode artifact: variables are "
                         "baked into the program and cannot be swapped")
    # legacy raw jax.export blob (variables baked as constants — jitting
    # it cannot re-fold anything that is not already folded)
    return jax.jit(jax.export.deserialize(bytearray(blob)).call)


# --- bucketed bundles (multi-batch-size serving) ---------------------------


def export_sampler_bundle(diff, *, batches, n_iters: int,
                          noise_factor: float = 1.0,
                          platforms=None) -> bytes:
    """Export one program per batch size into a single bundle.

    XLA programs have static shapes, so production serving buckets
    requests by size; this emits the standard bucket ladder (e.g.
    ``batches=[1, 8, 64]``) as one file — variables stored ONCE, shared
    by every bucket program. :func:`load_sampler_bundle` serves ANY
    request size from it: the smallest bucket that fits, with row
    padding (per-image denoising is batch-independent, so padded rows
    cannot perturb real ones), chunked through the largest bucket for
    oversized requests. ``only_last`` is pinned True — grid mode
    concatenates images across the batch axis and cannot be row-sliced
    back.
    """
    _check_exportable(diff)
    batches = sorted(set(int(b) for b in batches))
    if not batches or batches[0] < 1:
        raise ValueError(f"need positive batch sizes, got {batches!r}")
    variables = diff.net.variables
    paths, vb = _var_blob(variables)
    progs = [_export_program(diff, variables, batch=b, n_iters=n_iters,
                             only_last=True, noise_factor=noise_factor,
                             platforms=platforms)
             for b in batches]
    return _pack(_BUNDLE_MAGIC,
                 {"batches": batches, "var_len": len(vb),
                  "var_paths": paths,
                  "lengths": [len(p) for p in progs]}, vb, *progs)


def is_bundle(blob: bytes) -> bool:
    return blob[:4] == _BUNDLE_MAGIC


def load_sampler_bundle(blob: bytes, variables=None):
    """Deserialize a bundle into a callable serving ANY ``(n,1,h,w)``.

    Picks the smallest bucket >= n (padding the tail rows); requests
    larger than the biggest bucket run in chunks of it; n == 0 returns an
    empty batch without touching a program. Each bucket's executable is
    jit-cached with the weights as runtime arguments (never re-wrap in
    ``jax.jit`` — see module docstring). ``variables`` hot-swaps
    retrained weights (same shapes/dtypes) into every bucket.
    """
    _reject_retired(blob)
    if not is_bundle(blob):
        raise ValueError("not a sampler bundle (missing QSB magic); "
                         "use load_sampler for single-batch artifacts")
    header, rest = _unpack(blob)
    batches = header["batches"]
    vb, progs = _split_var_blob(header, rest)
    stored = _vars_from_blob(header["var_paths"], vb)
    v = stored if variables is None else variables
    v = jax.tree_util.tree_map(jnp.asarray, v)
    off, fns = 0, {}
    x_tail = out_tail = out_dtype = None
    for b, ln in zip(batches, header["lengths"]):
        exp = jax.export.deserialize(bytearray(progs[off:off + ln]))
        if x_tail is None:
            # first_x is fn's trailing positional arg -> last in_aval;
            # recorded so the n == 0 fast path below keeps the same
            # shape/dtype contract as every n > 0 request
            x_tail = tuple(exp.in_avals[-1].shape[1:])
            out_tail = tuple(exp.out_avals[0].shape[1:])
            out_dtype = exp.out_avals[0].dtype
        fns[b] = lambda first_x, _c=jax.jit(exp.call): _c(v, first_x)
        off += ln

    def _run_bucket(x):
        n = x.shape[0]
        if n == 0:
            if tuple(x.shape[1:]) != x_tail:
                raise ValueError(f"bundle expects inputs of shape "
                                 f"(n, {', '.join(map(str, x_tail))}); "
                                 f"got {tuple(x.shape)}")
            return jnp.zeros((0,) + out_tail, out_dtype)
        bucket = next((b for b in batches if b >= n), None)
        if bucket is None:
            big = batches[-1]
            return jnp.concatenate(
                [_run_bucket(x[i:i + big]) for i in range(0, n, big)])
        if n < bucket:
            pad = jnp.broadcast_to(x[-1:], (bucket - n,) + x.shape[1:])
            return fns[bucket](jnp.concatenate([x, pad]))[:n]
        return fns[bucket](x)

    return _run_bucket
