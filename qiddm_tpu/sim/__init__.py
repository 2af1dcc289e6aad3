"""qiddm_tpu.sim — from-scratch batched quantum-circuit simulation for TPU.

Replaces the reference's external simulators (PennyLane lightning.qubit /
default.qubit.torch / default.mixed, qiskit-aer) with JAX/XLA programs:
statevector + density-matrix backends, SEL blocks composed to dense unitaries
(MXU matmuls), exact autodiff gradients.
"""

from .engine import (  # noqa: F401
    NoiseModel,
    noise_from_code,
    qdense_circuit,
    qnn_circuit,
    reupload_block,
)
from .gates import qw_tanh, rot_matrix, ry_matrix, rz_matrix  # noqa: F401
from .trajectories import (  # noqa: F401
    apply_channel_trajectory,
    qdense_circuit_trajectories,
    qnn_circuit_trajectories,
    reupload_block_trajectories,
)
from .sel import sel_apply_direct, sel_ranges, sel_unitary  # noqa: F401
from .statevector import (  # noqa: F401
    amplitude_embed,
    apply_1q,
    apply_unitary,
    expval_z,
    probs,
    ry_product_state,
    rz_encode,
    rz_phases,
    zero_state,
)
