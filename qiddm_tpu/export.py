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
