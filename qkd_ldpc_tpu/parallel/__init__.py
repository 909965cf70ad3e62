"""Distribution: device meshes, sharded sweeps, multi-host bring-up."""

from qkd_ldpc_tpu.parallel.mesh import (
    NODE_AXIS,
    TRIAL_AXIS,
    initialize_distributed,
    make_mesh,
    make_trial_mesh,
    replicated,
    trial_sharding,
)
from qkd_ldpc_tpu.parallel.sweep import run_point_sharded

__all__ = [
    "NODE_AXIS",
    "TRIAL_AXIS",
    "initialize_distributed",
    "make_mesh",
    "make_trial_mesh",
    "replicated",
    "trial_sharding",
    "run_point_sharded",
]
