"""qiddm_tpu.parallel — device-mesh sharding for training and sweeps.

The reference has no distributed execution (Ray Tune throttled to one
concurrent local trial, SURVEY §2 parallelism notes). The TPU-native scaling
axes here:

* data parallel: the tau-expanded image batch sharded over a ``data`` mesh
  axis; gradients reduce over ICI via XLA's SPMD partitioner;
* trial parallel: hyperparameter sweeps vmapped over trials and sharded over
  a ``trial`` mesh axis (replaces Ray Tune).
"""

from .distributed import initialize as initialize_distributed  # noqa: F401
from .mesh import (  # noqa: F401
    dp_constraint,
    make_mesh,
    replicate,
    shard_leading_axis,
)
