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

Surface:

* :func:`export_sampler` / :func:`load_sampler` — single batch size
* :func:`export_sampler_bundle` / :func:`load_sampler_bundle` — bucketed
  batch-size ladder serving any request size
* CLI: ``python -m qiddm_tpu.cli.sample --export path.shlo`` /
  ``--from-export path.shlo`` (cli/sample.py)
"""

from __future__ import annotations

import json
import pickle
import struct

import jax
import jax.numpy as jnp
import numpy as np

_ARTIFACT_MAGIC = b"QSA2"
_BUNDLE_MAGIC = b"QSB2"
_BUNDLE_MAGIC_V1 = b"QSB1"  # round-3 interim format: constants-mode buckets


def _check_exportable(diff):
    if getattr(diff.net.module, "noise_trajectories", 0):
        raise ValueError(
            "trajectory-noise models sample with a fresh traj_rng per call "
            "and cannot be pinned into a fixed AOT artifact; export the "
            "clean model or use the density-matrix backend")


def _var_blob(variables):
    # snapshot to host numpy so later training of the live model cannot
    # alter the artifact
    return pickle.dumps(jax.tree_util.tree_map(np.asarray, variables))


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
    hlen = struct.unpack("<I", blob[4:8])[0]
    header = json.loads(blob[8:8 + hlen].decode())
    return header, blob[8 + hlen:]


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
    vb = _var_blob(variables)
    prog = _export_program(diff, variables, batch=batch, n_iters=n_iters,
                           only_last=only_last, noise_factor=noise_factor,
                           platforms=platforms)
    return _pack(_ARTIFACT_MAGIC, {"var_len": len(vb)}, vb, prog)


def load_sampler(blob: bytes, variables=None):
    """Deserialize an exported sampler into a callable ``first_x -> out``.

    The callable runs the embedded StableHLO through XLA on the current
    backend — no qiddm_tpu model code or checkpoint needed (the artifact
    carries the variables; only unpickle artifacts you produced). Pass
    ``variables`` to hot-swap retrained weights of the same
    shapes/dtypes into the program. Wrap in ``jax.jit`` for repeated
    serving so the executable is built once and cached.
    """
    if blob[:4] == _ARTIFACT_MAGIC:
        header, rest = _unpack(blob)
        stored = pickle.loads(rest[:header["var_len"]])
        call = jax.export.deserialize(
            bytearray(rest[header["var_len"]:])).call
        v = stored if variables is None else variables
        v = jax.tree_util.tree_map(jnp.asarray, v)
        return lambda first_x: call(v, first_x)
    if variables is not None:
        raise ValueError("legacy constants-mode artifact: variables are "
                         "baked into the program and cannot be swapped")
    # legacy raw jax.export blob (variables baked as constants)
    return jax.export.deserialize(bytearray(blob)).call


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
    vb = _var_blob(variables)
    progs = [_export_program(diff, variables, batch=b, n_iters=n_iters,
                             only_last=True, noise_factor=noise_factor,
                             platforms=platforms)
             for b in batches]
    return _pack(_BUNDLE_MAGIC,
                 {"batches": batches, "var_len": len(vb),
                  "lengths": [len(p) for p in progs]}, vb, *progs)


def is_bundle(blob: bytes) -> bool:
    return blob[:4] in (_BUNDLE_MAGIC, _BUNDLE_MAGIC_V1)


def load_sampler_bundle(blob: bytes, variables=None):
    """Deserialize a bundle into a callable serving ANY ``(n,1,h,w)``.

    Picks the smallest bucket >= n (padding the tail rows); requests
    larger than the biggest bucket run in chunks of it. Each bucket's
    executable is jit-cached on first use. ``variables`` hot-swaps
    retrained weights (same shapes/dtypes) into every bucket.
    """
    if not is_bundle(blob):
        raise ValueError("not a sampler bundle (missing QSB magic); "
                         "use load_sampler for single-batch artifacts")
    v1 = blob[:4] == _BUNDLE_MAGIC_V1
    header, rest = _unpack(blob)
    batches = header["batches"]
    if v1:
        if variables is not None:
            raise ValueError("legacy constants-mode bundle: variables are "
                             "baked into the programs")
        off, fns = 0, {}
        for b, ln in zip(batches, header["lengths"]):
            fns[b] = jax.jit(jax.export.deserialize(
                bytearray(rest[off:off + ln])).call)
            off += ln
    else:
        stored = pickle.loads(rest[:header["var_len"]])
        v = stored if variables is None else variables
        v = jax.tree_util.tree_map(jnp.asarray, v)
        off, fns = header["var_len"], {}
        for b, ln in zip(batches, header["lengths"]):
            call = jax.export.deserialize(
                bytearray(rest[off:off + ln])).call
            fns[b] = jax.jit(lambda first_x, _c=call: _c(v, first_x))
            off += ln

    def _run_bucket(x):
        n = x.shape[0]
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
