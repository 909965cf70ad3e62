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
from qkd_ldpc_tpu.parallel.node_sharded import (
    bp_decode_node_sharded,
    decode_node_sharded,
)
from qkd_ldpc_tpu.parallel.qc_node_sharded import (
    bp_decode_qc_node_sharded,
    decode_qc_node_sharded,
)
from qkd_ldpc_tpu.parallel.sweep import (
    run_point_node_sharded,
    run_point_sharded,
    run_sweep_sharded,
)

__all__ = [
    "bp_decode_node_sharded",
    "decode_node_sharded",
    "bp_decode_qc_node_sharded",
    "decode_qc_node_sharded",
    "NODE_AXIS",
    "TRIAL_AXIS",
    "initialize_distributed",
    "make_mesh",
    "make_trial_mesh",
    "replicated",
    "trial_sharding",
    "run_point_node_sharded",
    "run_point_sharded",
    "run_sweep_sharded",
]
