"""qiddm_tpu.native — the framework's own C++ simulation engine.

Bindings (ctypes) to ``qsim.cpp``: a native statevector / density-matrix
gate-stream interpreter playing the role the external C++ engines play in the
reference (PennyLane-Lightning, qiskit-aer). Built on demand with g++; see
``available()``.
"""

from .qsim import (  # noqa: F401
    Op,
    adjoint_grad,
    available,
    build_reupload_ops,
    build_sel_ops,
    density_run,
    sample_counts,
    statevector_run,
)
