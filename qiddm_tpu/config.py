"""Global numeric configuration for qiddm_tpu.

The reference codebase (aaai2026/QIDDM) runs everything in float64
(``.double()`` pervasive, e.g. reference nn/unet.py:47, src/mnist_exm.py:391).
On TPU the MXU wants float32/bfloat16, so the framework defaults to
float32/complex64 and exposes an opt-in x64 parity mode for bit-level
comparisons against the reference semantics.
"""

from __future__ import annotations

import os
import pathlib

import jax
import jax.numpy as jnp

_X64 = False


# The axon TPU plugin registers itself from sitecustomize at interpreter
# start and pins the platform to the TPU, which silently overrides a user's
# JAX_PLATFORMS=cpu — observed as drivers/tools hanging on backend init
# whenever the TPU tunnel is unreachable even though CPU was requested.
# Restore standard JAX semantics: an explicit JAX_PLATFORMS that does not
# name axon wins. (tests/conftest.py does the same re-pin for the suite.)
_want_platform = os.environ.get("JAX_PLATFORMS")
if _want_platform and "axon" not in _want_platform:
    try:
        jax.config.update("jax_platforms", _want_platform)
    except Exception as _e:
        # a backend is already live (jax was used before importing
        # qiddm_tpu): the pin can't apply — say so instead of letting the
        # user's explicit platform request silently vanish
        import warnings

        warnings.warn(
            f"JAX_PLATFORMS={_want_platform!r} could not be re-pinned past "
            f"the TPU plugin override ({_e}); the already-initialized "
            f"backend stays active")
del _want_platform


# --- persistent compilation cache -------------------------------------------
# Driver walls are compile-dominated (a multi-epoch scan program compiles in
# 20-100 s on the axon backend, then runs in seconds), and the reference's own
# workflow is rerun-heavy (its *_noise drivers cache sampler outputs on disk
# precisely to survive reruns, src/mnist_noise.py:293-308). XLA's persistent
# compilation cache makes every re-invocation of a driver/sweep skip straight
# to execution (measured on the real chip: 31.7 s -> 1.1 s for a scan
# program). Enabled by default; point QIDDM_XLA_CACHE_DIR elsewhere or set it
# empty to disable.

def _host_cpu_fingerprint() -> str:
    """Short tag for THIS host's CPU capabilities.

    XLA:CPU cache entries embed AOT code compiled for the build host's
    exact feature set (AVX-512/AMX/...); loading them on a lesser host is
    rejected at best ("cpu_aot_loader ... could lead to execution errors
    such as SIGILL" — observed when a shared home dir crossed machines).
    Keying the default cache dir on the feature set keeps entries
    host-compatible while still sharing across sessions on the same host.

    The jaxlib version is part of the key too: XLA's AOT target-machine
    string includes version-dependent pseudo-features (e.g.
    ``+prefer-no-scatter``), so entries written by one jaxlib fail to load
    under another with the same loud cpu_aot_loader error.
    """
    import hashlib
    import platform

    import jaxlib

    desc = platform.machine() + " jaxlib-" + jaxlib.__version__
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    desc += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(desc.encode()).hexdigest()[:8]


def _cache_platforms_ok(platforms: str | None) -> bool:
    """Whether the DEFAULT persistent cache should engage for this
    platform selection.

    XLA:CPU executables serialize as host-AOT machine code whose
    target-machine string carries compiler pseudo-features (e.g.
    ``+prefer-no-scatter``) that the load-time host-feature probe never
    reports — so every reload, even same host + same jaxlib, takes the
    cpu_aot_loader "could lead to execution errors such as SIGILL" path
    (observed in the 8-virtual-device dryrun, MULTICHIP_r03.json tail).
    The host fingerprint in the cache dir name cannot fix that: the
    mismatch is pseudo-feature vs detected-feature, not machine vs
    machine. CPU compiles here are seconds anyway; the cache exists for
    the TPU backend, whose serialized executables are device programs,
    not host code. An explicit QIDDM_XLA_CACHE_DIR or user jax config
    still wins — this gates only the package default."""
    if not platforms:
        return True  # auto-selected backend: TPU wherever one exists
    names = {p.strip().lower() for p in platforms.split(",") if p.strip()}
    return bool(names - {"cpu"})


def _setup_compilation_cache() -> None:
    try:
        cache_dir = os.environ.get("QIDDM_XLA_CACHE_DIR")
        user_configured = jax.config.jax_compilation_cache_dir is not None
        if cache_dir is None and not user_configured:
            platforms = (jax.config.jax_platforms
                         or os.environ.get("JAX_PLATFORMS"))
            if not _cache_platforms_ok(platforms):
                return
            cache_dir = str(pathlib.Path.home() / ".cache" / "qiddm_tpu"
                            / f"xla-{_host_cpu_fingerprint()}")
        if cache_dir:
            pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache anything that took >=0.5 s to compile, at any size
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
        elif not user_configured:
            return  # QIDDM_XLA_CACHE_DIR="": caching explicitly disabled
        # else: an explicit user configuration (JAX_COMPILATION_CACHE_DIR
        # or a pre-import jax.config.update) wins over the package default
        # — leave the dir and thresholds alone, but still apply the
        # deterministic-lowering flag below so Pallas programs can hit
        # WHICHEVER cache is active.
        #
        # Full tracebacks in MLIR locations make the serialized Mosaic
        # payload of pallas_call different on EVERY trace (verified: two
        # lowerings of the identical kernel program differ in the
        # custom-call body), so Pallas programs would never hit a
        # persistent cache — and the fused kernels are exactly the
        # multi-minute compiles the cache exists for. Trade: XLA error
        # messages lose the Python stack in op locations.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # unwritable dir / unsupported backend: run uncached
        pass


_setup_compilation_cache()


def enable_x64(on: bool = True) -> None:
    """Switch the whole framework (and JAX) to float64/complex128."""
    global _X64
    _X64 = on
    jax.config.update("jax_enable_x64", on)


def x64_enabled() -> bool:
    return _X64


def real_dtype():
    return jnp.float64 if _X64 else jnp.float32


def complex_dtype():
    return jnp.complex128 if _X64 else jnp.complex64


# TPU matmuls default to bfloat16 passes, which costs ~1e-3 relative error on
# complex statevector contractions — too loose for simulator parity (probs
# sums drift to ~0.998). The simulator pins fp32 accumulation on its hot
# contractions; set to "default" to trade parity for raw speed.
_MATMUL_PRECISION = "highest"


def set_matmul_precision(p: str) -> None:
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = p


def matmul_precision() -> str:
    return _MATMUL_PRECISION


# Fused Pallas kernels for the re-uploading chain (TPU only). Disable to
# force the pure-XLA path (e.g. for A/B benchmarking).
_USE_PALLAS = True

# The fused gate-chain kernels keep the full (2**w, B) state planes plus
# per-gate temporaries in scoped VMEM (96M limit via compiler params).
# Measured on v5e: w<=10 compiles in seconds at any reference depth;
# w=11-12 compile (2-14 min Mosaic wall) and run 1.3-1.4x faster than the
# XLA route (5.1 vs 7.3 ms/step at w=11, 9.5 vs 12.4 at w=12, L=14 k=2
# B=8) — raise the cap with set_pallas_max_wires(12) to opt in; beyond
# that Mosaic compile time is pathological (w=16 never finished). Above
# the cap the engine uses the gate-level XLA path (same O(L k w B d)
# work, scan-structured program: 24 s compile + 240 ms/step at w=16).
# The reference's own circuits never exceed 10 wires.
_PALLAS_MAX_WIRES = 10


def set_pallas_max_wires(w: int) -> None:
    global _PALLAS_MAX_WIRES
    _PALLAS_MAX_WIRES = w


def pallas_max_wires() -> int:
    return _PALLAS_MAX_WIRES


# Separate cap for the TRAJECTORY backend's SEL chains
# (sim/trajectories.py): trajectory batches (n_traj * batch states) put the
# wide gate-level XLA route firmly in the bandwidth-bound regime (~24
# full-state HBM passes per spectrum layer), where the batch-tiled fused
# kernel (sel_chain_pallas_tiled) keeps the state VMEM-resident per tile.
# The w=11-12 Mosaic compile that keeps the main-path default at 10 is a
# one-time cost here (one k-depth kernel shape reused for the whole
# sampler, persistent-cached via the deterministic lowering); beyond 12
# Mosaic compile is pathological (same ceiling as _PALLAS_MAX_WIRES).
_TRAJ_PALLAS_MAX_WIRES = 12


def set_traj_pallas_max_wires(w: int) -> None:
    global _TRAJ_PALLAS_MAX_WIRES
    _TRAJ_PALLAS_MAX_WIRES = w


def traj_pallas_max_wires() -> int:
    return _TRAJ_PALLAS_MAX_WIRES


def set_use_pallas(on: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = on


def use_pallas() -> bool:
    return _USE_PALLAS


# Adjoint-mode (O(1)-residual) differentiation for the pure-XLA gate-chain
# paths (sim/adjoint.py — the wide-circuit analogue of lightning.qubit's
# diff_method="adjoint", reference nn/qdense.py:237). The backward
# reconstructs intermediate states through inverse gates instead of letting
# autodiff store every one (O(L*k*wires) states of (batch, 2**w) — the
# residuals, not the live state, are what caps trainable wire counts).
# * "auto": adjoint on the wide gate-level routes (where the Pallas kernels
#   can't compile and residual memory is the binding constraint);
# * "on":   adjoint on every eligible gate-chain path (incl. the CPU/x64
#   parity fallbacks);
# * "off":  plain autodiff everywhere (A/B + debugging). Also the switch
#   for FORWARD-mode autodiff (jax.jvp/jacfwd) through the wide/mesh
#   routes: custom_vjp paths are reverse-mode only.
_ADJOINT_MODE = "auto"


def set_adjoint_mode(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(mode)
    global _ADJOINT_MODE
    _ADJOINT_MODE = mode


def adjoint_mode() -> str:
    return _ADJOINT_MODE


# Grouped-contraction wide chains (sim/wide.py): the w per-wire rotations
# of an SEL sublayer Kronecker-compose into ceil(w/7) group matrices
# (<= 128 x 128, one MXU tile edge) applied as batched matmuls — 3 HBM
# passes instead of w per-gate passes at w=20 (measured 15.6x/sublayer on
# v5e, tools/bench_wide_micro.py), with the same O(1)-residual adjoint
# backward as sim/adjoint.py.
# * "auto": on TPU beyond the Pallas width cap (the regime the per-gate
#   adjoint path used to own); deferring to adjoint_mode()=="off" so the
#   forward-autodiff escape hatch still covers every wide route;
# * "on":   every gate-chain path eligible for adjoint (CPU parity/A-B);
# * "off":  previous behavior (per-gate adjoint chains).
_WIDE_MODE = "auto"


def set_wide_mode(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(mode)
    global _WIDE_MODE
    _WIDE_MODE = mode


def wide_mode() -> str:
    return _WIDE_MODE


# Lower width bound where the grouped-Kronecker chain takes over from the
# fused Pallas gate kernels on TPU (wide_mode "auto"). Measured on v5e
# (tools/bench_narrow_route_ab.py; results/narrow_route_ab{,_b88,_qdense}
# .json, L=14 k=2, 100-step scans, identical losses): at w=8 the Pallas
# chain kernels win (2082 vs 1955 steps/s reupload, 2359 vs 1871 qdense);
# from w=9 the grouped MXU contractions win every shape — 1.5x qdense B=8
# (1755 vs 1169), 1.08x reupload B=88 (1223 vs 1131) — and by w=10 the
# gap is 2.5-2.9x (1639 vs 563 reupload B=8) while the Mosaic compile
# balloons (15-69 s vs 3 s). 28x28 models run exactly w=10, so this bound
# carries the flagship training rows. The Pallas kernels keep w<=8 (sub-ms
# VMEM-resident chains) and every density-matrix route (pallas_max_wires
# still governs those).
_WIDE_MIN_WIRES = 9


def set_wide_min_wires(w: int) -> None:
    global _WIDE_MIN_WIRES
    _WIDE_MIN_WIRES = w


def wide_min_wires() -> int:
    return _WIDE_MIN_WIRES


# VMEM-resident fused kernel for the wide chain (sim/pallas_wide_kernel.py):
# * "off" (DEFAULT): always the XLA grouped chain. The on-chip A/B
#   (tools/bench_wide_kernel_ab.py, results/wide_kernel_ab_w{16,20}.json,
#   v5e) rejected the kernel: at w=16 (L=14, k=2, B=8) the scan variant
#   matches the XLA chain numerically (loss drift 1.5e-7) but runs
#   0.34 steps/s vs 26.8 — 80x SLOWER, after a 570 s Mosaic compile —
#   and at w=20 its backward does not compile at all (143.2 MB scoped
#   VMEM demanded vs the chip's 128 MB; 74.7 MB of it register-allocator
#   spill slots — the sublayer body's live set far exceeds what Mosaic
#   can register-allocate). The grouped-Kronecker XLA chain (sim/wide.py)
#   stays the production wide route.
# * "auto": the fused kernel on TPU for eligible chains (rz encode, CZ
#   ring, complex64, 13 <= wires <= 20 — see wide._use_wide_kernel);
# * "on":   force anywhere eligible (off-TPU runs interpret-mode — CPU
#   parity tests).
#
# Which kernel the route uses is governed by _WIDE_KERNEL_VARIANT:
# * "scan":     per-sublayer programs reused via lax.scan — bounded Mosaic
#   compile, 2 HBM passes per sublayer. Compiles at w<=16 but spills (see
#   above); measured 80x slower than XLA at w=16, VMEM-OOM at w=20.
# * "monolith": the whole L x k chain in one kernel, superstate
#   VMEM-resident end to end — minimum HBM, but Mosaic compile cost
#   scales with depth (556 s for the L=1 fwd through the axon remote
#   compiler; even the L=1 BACKWARD OOM-kills the compile helper after
#   ~25 min — results/wide_kernel_bisect.json). Guarded: selecting it at
#   L > 1 on TPU raises (sim/wide.py::_check_monolith_depth).
_WIDE_KERNEL_MODE = "off"
_WIDE_KERNEL_VARIANT = "scan"


def set_wide_kernel_mode(mode: str) -> None:
    if mode not in ("auto", "on", "off"):
        raise ValueError(mode)
    global _WIDE_KERNEL_MODE
    _WIDE_KERNEL_MODE = mode


def set_wide_kernel_variant(variant: str) -> None:
    if variant not in ("scan", "monolith"):
        raise ValueError(variant)
    global _WIDE_KERNEL_VARIANT
    _WIDE_KERNEL_VARIANT = variant


def wide_kernel_variant() -> str:
    return _WIDE_KERNEL_VARIANT


def wide_kernel_mode() -> str:
    return _WIDE_KERNEL_MODE


# Density-backend all-wires channel application strategy:
# * "perwire": the closed-form per-wire block pass (elementwise mask + one
#   block add per wire) — few FLOPs, 2 small VPU ops per wire;
# * "grouped": Kronecker-power superoperator contraction in 4-wire groups
#   (2 dense einsums for 8 wires) — MXU work, fewer kernels, but each pass
#   moves/contracts the whole rho per group.
# Both are exact (tests pin equality); the default is the variant that
# measured faster for the noise-sweep workload on the v5e (see DESIGN.md).
_DM_CHANNEL_MODE = "perwire"


def set_dm_channel_mode(mode: str) -> None:
    if mode not in ("perwire", "grouped"):
        raise ValueError(mode)
    global _DM_CHANNEL_MODE
    _DM_CHANNEL_MODE = mode


def dm_channel_mode() -> str:
    return _DM_CHANNEL_MODE


# Density-backend SEL application strategy:
# * "gates":  apply the SEL chain gate-by-gate — where eligible the WHOLE
#   dm block (encode -> channel -> SEL both sides) fuses into one Pallas
#   kernel with rho VMEM-resident (sim/pallas_dm_kernel.py); otherwise
#   two-sided gate chains via density.apply_chain_two_sided. Never
#   materializes a (d, d) unitary;
# * "matmul": compose per-layer unitaries and sandwich rho between two
#   batched complex matmuls (the round-2 path) — O(b d^3) MXU work.
# Both are exact (tests pin equality); the fused "gates" route measured
# 4.4x faster dm sampling on the v5e (208 vs 47 img/s; 12.9x on the block
# forward alone — the dm step is op-overhead-bound, not FLOP-bound:
# results/dm_unitary_ab.json, DESIGN.md).
_DM_UNITARY_MODE = "gates"


def set_dm_unitary_mode(mode: str) -> None:
    if mode not in ("gates", "matmul"):
        raise ValueError(mode)
    global _DM_UNITARY_MODE
    _DM_UNITARY_MODE = mode


def dm_unitary_mode() -> str:
    return _DM_UNITARY_MODE
