"""GF(2) syndrome computation.

Counterpart of ``calculate_syndrome_{regular,irregular}`` (reference
``src/array_and_matrix_operations.cpp:463-486``): s_c = XOR of the key bits
at check c's neighbors.  Implemented as a masked gather + parity reduction;
one path for both regularities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode


def syndrome(code: LDPCCode, bits: jax.Array) -> jax.Array:
    """Syndrome of ``bits`` [..., N] -> [..., M] int8."""
    chk_adj = jnp.asarray(code.chk_adj)  # [M, dc]
    chk_mask = jnp.asarray(code.chk_mask)
    gathered = jnp.take(bits.astype(jnp.int32), chk_adj, axis=-1)  # [..., M, dc]
    gathered = jnp.where(chk_mask, gathered, 0)
    return (jnp.sum(gathered, axis=-1) & 1).astype(jnp.int8)
