"""ctypes bindings + on-demand build for the native qsim engine."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = pathlib.Path(__file__).parent
_LIB_PATH = _HERE / "libqsim.so"
_LOCK = threading.Lock()
_LIB = None
_BUILD_ERROR: Optional[str] = None

# op kinds — keep in sync with qsim.cpp
RX, RY, RZ, ROT, CZ, CNOT, PHASESHIFT = range(7)
CH_PHASE_DAMP, CH_AMP_DAMP, CH_DEPOL = 7, 8, 9

_CHANNEL_KINDS = {
    "phase_shift": PHASESHIFT,
    "phase_damping": CH_PHASE_DAMP,
    "amplitude_damping": CH_AMP_DAMP,
    "depolarizing": CH_DEPOL,
}


class Op(ctypes.Structure):
    _fields_ = [
        ("kind", ctypes.c_int32),
        ("wire", ctypes.c_int32),
        ("wire2", ctypes.c_int32),
        ("p0", ctypes.c_double),
        ("p1", ctypes.c_double),
        ("p2", ctypes.c_double),
    ]


def _build() -> Optional[str]:
    src = _HERE / "qsim.cpp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_LIB_PATH), str(src)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300)
    except Exception as e:  # compiler missing etc.
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _LIB, _BUILD_ERROR
    with _LOCK:
        if _LIB is not None or _BUILD_ERROR is not None:
            return _LIB
        if not _LIB_PATH.exists() or (
                _LIB_PATH.stat().st_mtime
                < (_HERE / "qsim.cpp").stat().st_mtime):
            err = _build()
            if err is not None:
                _BUILD_ERROR = err
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            # a stale/foreign-platform .so (e.g. checked out on another
            # arch): rebuild once; available() must return False, not raise
            err = _build()
            if err is not None:
                _BUILD_ERROR = err
                return None
            try:
                lib = ctypes.CDLL(str(_LIB_PATH))
            except OSError as e:
                _BUILD_ERROR = f"load failed after rebuild: {e}"
                return None
        pd = ctypes.POINTER(ctypes.c_double)
        lib.qsim_statevector_run.restype = ctypes.c_int
        lib.qsim_statevector_run.argtypes = [
            ctypes.c_int, ctypes.POINTER(Op), ctypes.c_int, pd, pd, pd, pd]
        lib.qsim_density_run.restype = ctypes.c_int
        lib.qsim_density_run.argtypes = [
            ctypes.c_int, ctypes.POINTER(Op), ctypes.c_int, pd, pd, pd]
        lib.qsim_sample_counts.restype = ctypes.c_int
        lib.qsim_sample_counts.argtypes = [
            pd, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.qsim_adjoint_grad.restype = ctypes.c_int
        lib.qsim_adjoint_grad.argtypes = [
            ctypes.c_int, ctypes.POINTER(Op), ctypes.c_int, pd, pd, pd]
        lib.qsim_n_params.restype = ctypes.c_int
        lib.qsim_n_params.argtypes = [ctypes.POINTER(Op), ctypes.c_int]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _BUILD_ERROR


def _ops_array(ops: Sequence[tuple]):
    arr = (Op * len(ops))()
    for i, o in enumerate(ops):
        kind, wire, wire2, p0, p1, p2 = (list(o) + [0, 0, 0.0, 0.0, 0.0])[:6]
        arr[i] = Op(int(kind), int(wire), int(wire2), float(p0), float(p1),
                    float(p2))
    return arr


def statevector_run(wires: int, ops: Sequence[tuple],
                    init_amps: Optional[np.ndarray] = None,
                    want_state: bool = False):
    """Run a gate stream; returns (probs, expvals[, state])."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native qsim unavailable: {_BUILD_ERROR}")
    dim = 1 << wires
    arr = _ops_array(ops)
    init = None
    if init_amps is not None:
        ia = np.ascontiguousarray(
            np.stack([np.real(init_amps), np.imag(init_amps)], -1).ravel(),
            dtype=np.float64)
        init = ia.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    probs = np.zeros(dim, np.float64)
    ev = np.zeros(wires, np.float64)
    state = np.zeros(2 * dim, np.float64) if want_state else None
    rc = lib.qsim_statevector_run(
        wires, arr, len(ops), init,
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if want_state
        else None,
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ev.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise ValueError("channel ops require density_run")
    if want_state:
        return probs, ev, state[0::2] + 1j * state[1::2]
    return probs, ev


def density_run(wires: int, ops: Sequence[tuple],
                init_amps: Optional[np.ndarray] = None):
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native qsim unavailable: {_BUILD_ERROR}")
    dim = 1 << wires
    arr = _ops_array(ops)
    init = None
    if init_amps is not None:
        ia = np.ascontiguousarray(
            np.stack([np.real(init_amps), np.imag(init_amps)], -1).ravel(),
            dtype=np.float64)
        init = ia.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    probs = np.zeros(dim, np.float64)
    ev = np.zeros(wires, np.float64)
    lib.qsim_density_run(
        wires, arr, len(ops), init,
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ev.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return probs, ev


def adjoint_grad(wires: int, ops: Sequence[tuple],
                 init_amps: Optional[np.ndarray] = None):
    """Adjoint-method Jacobian — the lightning.qubit differentiator.

    Returns ``(expvals, jac)``: ``expvals`` (wires,) are the final-state
    <Z_w>; ``jac`` (wires, n_params) holds d<Z_w>/dtheta for every
    parametrized gate in stream order (RX/RY/RZ/PhaseShift contribute one
    column, Rot three). One forward pass + one backward unitary sweep —
    O(n_ops * 2**wires) per observable vs parameter-shift's 2*n_params
    full circuit evaluations (reference nn/qdense.py:1285-1297 pays the
    latter on lightning.qubit). Channel ops are rejected: the adjoint
    trick requires a unitary stream.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native qsim unavailable: {_BUILD_ERROR}")
    arr = _ops_array(ops)
    n_params = lib.qsim_n_params(arr, len(ops))
    init = None
    if init_amps is not None:
        ia = np.ascontiguousarray(
            np.stack([np.real(init_amps), np.imag(init_amps)], -1).ravel(),
            dtype=np.float64)
        init = ia.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    ev = np.zeros(wires, np.float64)
    jac = np.zeros((wires, n_params), np.float64)
    rc = lib.qsim_adjoint_grad(
        wires, arr, len(ops), init,
        ev.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        jac.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise ValueError("adjoint differentiation requires a unitary "
                         "stream (no channel ops)")
    return ev, jac


def sample_counts(probs: np.ndarray, shots: int, seed: int = 0) -> np.ndarray:
    """Multinomial shot sampling (the aer-backend analogue)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native qsim unavailable: {_BUILD_ERROR}")
    probs = np.ascontiguousarray(probs, np.float64)
    counts = np.zeros(len(probs), np.int64)
    lib.qsim_sample_counts(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(probs), int(shots), int(seed),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return counts


# --- circuit builders (mirror qiddm_tpu.sim circuit structure) -------------

def build_sel_ops(weights: np.ndarray, imprimitive: str = "cnot",
                  ranges: Optional[List[int]] = None) -> List[tuple]:
    """StronglyEntanglingLayers as a gate stream.

    weights: (layers, wires, 3); ranges default to the cycling pattern.
    """
    from ..sim.sel import sel_ranges

    layers, wires, _ = weights.shape
    if ranges is None:
        ranges = sel_ranges(layers, wires)
    imp = CNOT if imprimitive == "cnot" else CZ
    ops: List[tuple] = []
    for l in range(layers):
        for j in range(wires):
            ops.append((ROT, j, 0, weights[l, j, 0], weights[l, j, 1],
                        weights[l, j, 2]))
        if wires > 1:
            for j in range(wires):
                ops.append((imp, j, (j + ranges[l]) % wires))
    return ops


def build_reupload_ops(x: np.ndarray, weights: np.ndarray,
                       encode: str = "rz", imprimitive: str = "cz",
                       noise_kind: Optional[str] = None,
                       noise_strength: float = 0.0,
                       noise_placement: str = "encode") -> List[tuple]:
    """One re-uploading block as a gate stream.

    x: (wires,) angles; weights: (L, k, wires, 3).
    """
    L, k, wires, _ = weights.shape
    enc = {"rz": RZ, "ry": RY, "rz_halfpi": RZ}[encode]
    scale = 0.5 * np.pi if encode == "rz_halfpi" else 1.0
    ops: List[tuple] = []
    for i in range(L):
        for j in range(wires):
            ops.append((enc, j, 0, scale * float(x[j])))
            if noise_kind and noise_placement == "encode":
                ops.append((_CHANNEL_KINDS[noise_kind], j, 0, noise_strength))
        ops.extend(build_sel_ops(weights[i], imprimitive))
    if noise_kind and noise_placement == "end":
        for j in range(wires):
            ops.append((_CHANNEL_KINDS[noise_kind], j, 0, noise_strength))
    return ops
