"""AOT serving artifacts via ``jax.export`` (serialized StableHLO).

The reference has no deployment story — sampling happens inline in its
training scripts (src/mnist_exm.py:206-291). For production TPU serving,
this module serializes the COMPILED sampler once: model variables baked
in as program constants, shapes pinned static, one self-contained
artifact that reloads and runs with no model code, no checkpoint, and no
retracing (jax.export carries explicit forward/backward compatibility
windows for serialized programs). Cross-platform lowering lets a CPU
build host emit the TPU serving artifact (``platforms=("tpu",)``).

Surface:

* :func:`export_sampler` — Diffusion -> bytes
* :func:`load_sampler`   — bytes -> callable ``(first_x) -> images``
* CLI: ``python -m qiddm_tpu.cli.sample --export path.shlo`` /
  ``--from-export path.shlo`` (cli/sample.py)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def export_sampler(diff, *, batch: int, n_iters: int,
                   only_last: bool = True, noise_factor: float = 1.0,
                   platforms=None) -> bytes:
    """Serialize ``diff``'s sampler as a self-contained AOT artifact.

    ``batch``, ``n_iters``, and the image shape are pinned into the
    program (static shapes — the XLA contract; export several batch sizes
    for bucketed serving). ``only_last=True`` emits ``(batch, 1, h, w)``
    final images; ``False`` emits the reference's stacked grid
    (src/models.py:141-146). ``platforms``: e.g. ``("tpu",)`` to emit a
    TPU artifact from a CPU host; default = the current backend.

    Trajectory-noise models need a ``traj_rng`` each call and are not
    exportable as a fixed program — seed-pinned export would silently
    reuse one noise draw; rejected explicitly.
    """
    if getattr(diff.net.module, "noise_trajectories", 0):
        raise ValueError(
            "trajectory-noise models sample with a fresh traj_rng per call "
            "and cannot be pinned into a fixed AOT artifact; export the "
            "clean model or use the density-matrix backend")
    variables = diff.net.variables

    def fn(first_x):
        return diff.sample_fn(variables, first_x, n_iters,
                              only_last=only_last,
                              noise_factor=noise_factor)

    spec = jax.ShapeDtypeStruct((batch, 1, diff.width, diff.height),
                                jnp.float32)
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(spec)
    return bytes(exp.serialize())


def load_sampler(blob: bytes):
    """Deserialize an exported sampler into a callable ``first_x -> out``.

    The callable runs the embedded StableHLO through XLA on the current
    backend — no qiddm_tpu model code or checkpoint needed (the variables
    are program constants). Wrap in ``jax.jit`` for repeated serving so
    the executable is built once and cached.
    """
    exp = jax.export.deserialize(bytearray(blob))
    return exp.call


# --- bucketed bundles (multi-batch-size serving) ---------------------------

_BUNDLE_MAGIC = b"QSB1"


def export_sampler_bundle(diff, *, batches, n_iters: int,
                          noise_factor: float = 1.0,
                          platforms=None) -> bytes:
    """Export one artifact per batch size into a single bundle.

    XLA programs have static shapes, so production serving buckets
    requests by size; this emits the standard bucket ladder (e.g.
    ``batches=[1, 8, 64]``) as one file. :func:`load_sampler_bundle`
    serves ANY request size from it: the smallest bucket that fits, with
    row padding (per-image denoising is batch-independent, so padded
    rows cannot perturb real ones), chunked through the largest bucket
    for oversized requests. ``only_last`` is pinned True — grid mode
    concatenates images across the batch axis and cannot be
    row-sliced back.
    """
    import json
    import struct

    batches = sorted(set(int(b) for b in batches))
    if not batches or batches[0] < 1:
        raise ValueError(f"need positive batch sizes, got {batches!r}")
    blobs = [export_sampler(diff, batch=b, n_iters=n_iters, only_last=True,
                            noise_factor=noise_factor, platforms=platforms)
             for b in batches]
    header = json.dumps({"batches": batches,
                         "lengths": [len(b) for b in blobs]}).encode()
    return (_BUNDLE_MAGIC + struct.pack("<I", len(header)) + header
            + b"".join(blobs))


def is_bundle(blob: bytes) -> bool:
    return blob[:4] == _BUNDLE_MAGIC


def load_sampler_bundle(blob: bytes):
    """Deserialize a bundle into a callable serving ANY ``(n,1,h,w)``.

    Picks the smallest bucket >= n (padding the tail rows); requests
    larger than the biggest bucket run in chunks of it. Each bucket's
    executable is jit-cached on first use.
    """
    import json
    import struct

    if not is_bundle(blob):
        raise ValueError("not a sampler bundle (missing QSB1 magic); "
                         "use load_sampler for single-batch artifacts")
    hlen = struct.unpack("<I", blob[4:8])[0]
    meta = json.loads(blob[8:8 + hlen].decode())
    batches = meta["batches"]
    fns = {}
    off = 8 + hlen
    for b, ln in zip(batches, meta["lengths"]):
        fns[b] = jax.jit(jax.export.deserialize(
            bytearray(blob[off:off + ln])).call)
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
