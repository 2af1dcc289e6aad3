"""qiddm_tpu — TPU-native quantum denoising diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of aaai2026/QIDDM
(quantum denoising diffusion models for image generation): batched quantum
circuit simulation (qiddm_tpu.sim), the full denoiser zoo (qiddm_tpu.nn),
the diffusion engine (qiddm_tpu.diffusion), data loaders, metrics, sweeps,
and experiment CLIs (qiddm_tpu.cli).
"""

from . import config  # noqa: F401

__version__ = "0.1.0"
