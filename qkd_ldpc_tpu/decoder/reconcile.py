"""QKD information-reconciliation protocol step.

Pure-functional core of the reference's ``QKD_LDPC_{regular,irregular}``
(``src/qkd_ldpc_algorithm.cpp:347-447``): build a-priori LLRs from Bob's
noisy key and the channel QBER, compute Alice's syndrome, run syndrome-
target BP decoding of Bob's key toward it, and (simulation-only oracle)
verify the corrected key against Alice's.

In a production QKD stack the syndrome crosses a network boundary; here,
as in the reference, it is a function argument — `reconcile_with_syndrome`
is the deployable Bob-side API, `reconcile` the simulation convenience that
also plays Alice.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode
from qkd_ldpc_tpu.decoder.bp import DecodeOptions, DecodeResult, decode
from qkd_ldpc_tpu.decoder.syndrome import syndrome


class ReconcileResult(NamedTuple):
    """Mirror of the reference's ``LDPC_result``
    (``src/qkd_ldpc_algorithm.hpp:20-24``) plus the corrected key."""

    bits: jax.Array  # [B, N] corrected key (Bob's solution)
    iterations: jax.Array  # [B] int32
    syndromes_match: jax.Array  # [B] bool (SP convergence)
    keys_match: jax.Array  # [B] bool (oracle check vs Alice)


def apriori_llr(bob_bits: jax.Array, qber, dtype=jnp.float32) -> jax.Array:
    """A-priori LLRs: llr_i = +log((1-q)/q) for bit 0, negative for bit 1
    (reference qkd_ldpc_algorithm.cpp:349-354)."""
    qber = jnp.asarray(qber, dtype)
    log_p = jnp.log((1.0 - qber) / qber)
    if log_p.ndim == 1:  # per-frame QBER broadcast over bits
        log_p = log_p[:, None]
    return jnp.where(bob_bits == 1, -log_p, log_p).astype(dtype)


def reconcile_with_syndrome(
    code: LDPCCode,
    bob_bits: jax.Array,  # [B, N] or [N]
    alice_syndrome: jax.Array,  # [B, M] or [M]
    qber,
    opts: DecodeOptions = DecodeOptions(),
) -> DecodeResult:
    """Bob-side reconciliation: decode the noisy key toward Alice's syndrome."""
    llr = apriori_llr(jnp.asarray(bob_bits), qber)
    return decode(code, llr, jnp.asarray(alice_syndrome), opts)


def reconcile(
    code: LDPCCode,
    alice_bits: jax.Array,  # [B, N] or [N]
    bob_bits: jax.Array,
    qber,
    opts: DecodeOptions = DecodeOptions(),
) -> ReconcileResult:
    """Full simulated protocol step with the keys-match oracle check
    (reference qkd_ldpc_algorithm.cpp:382: detects undetected frame errors
    where syndromes converge but the key is wrong)."""
    alice_bits = jnp.asarray(alice_bits)
    alice_syn = syndrome(code, alice_bits)
    res = reconcile_with_syndrome(code, bob_bits, alice_syn, qber, opts)
    keys_match = jnp.all(
        res.bits.astype(jnp.int8) == alice_bits.astype(jnp.int8), axis=-1
    )
    return ReconcileResult(
        bits=res.bits,
        iterations=res.iterations,
        syndromes_match=res.syndromes_match,
        keys_match=keys_match,
    )
