"""qkd_ldpc_tpu — TPU-native QKD LDPC error-reconciliation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
C++ reference simulator ColdCloudd/QKD_LDPC (see SURVEY.md):

- parity-check-matrix ingest (alist + dense formats)  -> `qkd_ldpc_tpu.codes`
- key generation + exact-weight binary channel        -> `qkd_ldpc_tpu.channel`
- syndrome-target sum-product / min-sum BP decoding   -> `qkd_ldpc_tpu.decoder`
- Pallas TPU kernels for the BP hot loop              -> `qkd_ldpc_tpu.ops`
- mesh / sharded Monte-Carlo sweeps                   -> `qkd_ldpc_tpu.parallel`
- QBER sweep planning, stats, CSV, checkpointing      -> `qkd_ldpc_tpu.sim`
- native C++ ingest + reference-parity PRNG channel   -> `qkd_ldpc_tpu.native`

Unlike the reference (one process, a CPU thread pool over trials,
scalar C++ loops over graph edges), everything here is expressed as pure
functions over dense padded tensors with a leading/trailing batch ("frame")
axis, jitted through XLA, and sharded over `jax.sharding.Mesh` axes.
"""

from qkd_ldpc_tpu.config import Config, load_config
from qkd_ldpc_tpu.codes import LDPCCode, read_alist, read_dense, load_code
from qkd_ldpc_tpu.decoder import (
    DecodeResult,
    decode,
    reconcile,
    syndrome,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "load_config",
    "LDPCCode",
    "read_alist",
    "read_dense",
    "load_code",
    "DecodeResult",
    "decode",
    "reconcile",
    "syndrome",
    "__version__",
]
