"""Post-reconciliation stages: error verification + privacy amplification.

The reference stops at reconciliation and checks ``keys_match`` against
Alice's key directly — an oracle only a simulation has
(``src/qkd_ldpc_algorithm.cpp:382``).  A deployed QKD post-processor
needs the two stages that follow:

- **Error verification**: syndrome convergence does NOT imply key
  equality (undetected frame errors decode to a different codeword
  coset member).  Both sides exchange a short universal hash of the
  reconciled key and discard frames that disagree; the residual
  undetected-error probability is 2^-out_bits.
- **Privacy amplification**: compress the verified key by the disclosed
  information (syndrome bits, verification hash, revealed bits — the
  ``leak_bits`` accounting carried by `serve.Reconciler`,
  `decoder.RateAdapter`, and `decoder.blind`) plus a security margin,
  with a 2-universal hash.

Both use seeded binary TOEPLITZ hashing — the standard 2-universal
family (Krawczyk; Mauerer et al.): ``T[i, j] = s[i - j + n - 1]`` from a
shared random seed sequence of n + k - 1 bits, so the classical channel
carries only the seed.  TPU-natively the GF(2) matvec runs on the MXU:
bf16 0/1 operands, f32 accumulation (exact — row sums are bounded by n
<< 2^24), parity taken mod 2.  One [B, n] x [n, k] matmul hashes a whole
batch of frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def toeplitz_matrix(seed_key: jax.Array, n_in: int, n_out: int) -> jax.Array:
    """Binary Toeplitz matrix [n_out, n_in] from n_in + n_out - 1 seeded
    bits (the shared classical message, here derived from a PRNG key both
    sides hold)."""
    if n_out < 1 or n_in < 1:
        raise ValueError("hash dimensions must be >= 1")
    s = jax.random.bernoulli(seed_key, 0.5, (n_in + n_out - 1,))
    i = jnp.arange(n_out)[:, None]
    j = jnp.arange(n_in)[None, :]
    return s[i - j + (n_in - 1)].astype(jnp.bfloat16)


@jax.jit
def _hash_apply(T: jax.Array, bits: jax.Array) -> jax.Array:
    # MXU matmul: bf16 0/1 inputs, f32 accumulation is exact for row sums
    # bounded by n_in (<< 2^24); parity = mod 2.
    acc = jax.lax.dot_general(
        bits.astype(jnp.bfloat16), T.T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc.astype(jnp.int32) & 1).astype(jnp.uint8)


def toeplitz_hash(bits: jax.Array, seed_key: jax.Array, n_out: int) -> jax.Array:
    """Hash key frames [B, n] (or [n]) to [B, n_out] (or [n_out]) bits."""
    arr = jnp.atleast_2d(jnp.asarray(bits, jnp.uint8))
    T = toeplitz_matrix(seed_key, arr.shape[-1], n_out)
    out = _hash_apply(T, arr)
    return out[0] if jnp.asarray(bits).ndim == 1 else out


def verification_tags(bits: jax.Array, seed_key: jax.Array,
                      tag_bits: int = 64) -> jax.Array:
    """Short verification hash per frame ([.., tag_bits] uint8).

    Alice and Bob each compute tags over their (reconciled) keys with the
    same seed and exchange them; a mismatch flags an undetected frame
    error (probability of a wrong frame passing: 2^-tag_bits).  The tag
    itself is disclosed — count ``tag_bits`` into the leakage budget.
    """
    return toeplitz_hash(bits, seed_key, tag_bits)


def amplified_key_bits(payload_bits: int, leak_bits: int,
                       tag_bits: int = 64, security_bits: int = 100) -> int:
    """Final-key length after privacy amplification: payload minus all
    disclosed information minus the security parameter (the standard
    leftover-hash-lemma budget; returns 0 if the frame yields no key)."""
    return max(0, payload_bits - leak_bits - tag_bits - security_bits)


def privacy_amplify(bits: jax.Array, seed_key: jax.Array,
                    final_bits: int) -> jax.Array:
    """Compress verified key frames to ``final_bits`` with a 2-universal
    Toeplitz hash ([.., final_bits] uint8)."""
    if final_bits < 1:
        raise ValueError(
            "no key material left after the leakage budget; use a lower "
            "rate (shorten) or a better channel"
        )
    return toeplitz_hash(bits, seed_key, final_bits)
