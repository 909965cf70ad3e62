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
<< 2^24), parity taken mod 2.

Two evaluation paths, bit-identical (same seed stream, same matrix —
tests/test_postprocess.py):

- **dense** — materialize T once, one [B, n] x [n, k] matmul.  Right for
  tag-sized outputs and small frames; at production frame sizes the
  matrix itself is the problem (N=262,144 -> a [~125k, 262k] bf16 T is
  ~61 GB: cannot exist on device).
- **blocked** (round 3) — stream T through VMEM one [bo, bi] Toeplitz
  block at a time: each block is a static-pattern gather from a
  (bo + bi - 1)-slice of the seed sequence, immediately consumed by an
  MXU matmul and discarded.  Peak memory is O(n + bo*bi + k*B)
  regardless of frame size; per-block row sums (<= bi) and the f32
  accumulation across blocks (<= n < 2^24) are exact integers, so the
  parity is exact.  This is what lets amplification run at the frame
  sizes the decoder itself serves (benchmarks/frame_scale.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def toeplitz_matrix(seed_key: jax.Array, n_in: int, n_out: int) -> jax.Array:
    """Binary Toeplitz matrix [n_out, n_in] from n_in + n_out - 1 seeded
    bits (the shared classical message, here derived from a PRNG key both
    sides hold).

    Built by the shear-tiling identity (contiguous copies only):
    tiling a period-(L + 1) sequence into rows of length L = n_in +
    n_out - 1 shifts each row's phase by one, so with v = flip(s) + one
    junk element, columns [n_out - 1, n_out - 1 + n_in) are exactly
    T[i, j] = s[i - j + n_in - 1].  The fancy-indexing formulation is a
    [n_out * n_in]-descriptor gather — ~10x slower on TPU.
    """
    if n_out < 1 or n_in < 1:
        raise ValueError("hash dimensions must be >= 1")
    s = jax.random.bernoulli(seed_key, 0.5, (n_in + n_out - 1,))
    L = n_in + n_out - 1
    v = jnp.concatenate([jnp.flip(s), jnp.zeros((1,), s.dtype)])
    t = jnp.broadcast_to(v, (n_out, L + 1)).reshape(-1)[: n_out * L]
    return t.reshape(n_out, L)[
        :, n_out - 1 : n_out - 1 + n_in
    ].astype(jnp.bfloat16)


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


@partial(jax.jit, static_argnames=("n_in", "n_out", "bo", "bi"))
def _hash_apply_blocked(
    s: jax.Array,  # [n_in + n_out - 1] seed bits (the classical message)
    bits: jax.Array,  # [B, n_in] uint8
    n_in: int,
    n_out: int,
    bo: int,  # output-rows per block
    bi: int,  # input-cols per block (tall: amortizes the block build)
) -> jax.Array:
    """Streaming block-Toeplitz hash: T is never materialized.

    T[i, j] = s[i - j + n_in - 1]; block (I, J) of shape [bo, bi] is the
    SAME static gather pattern applied to a sliding (bo + bi - 1)-slice
    of s, built in VMEM-sized pieces and consumed by one MXU matmul
    each.  Exact: per-block row sums <= bi, f32 accumulation across
    blocks <= n_in < 2^24.
    """
    B = bits.shape[0]
    nI = -(-n_out // bo)
    nJ = -(-n_in // bi)
    # Zero-pad s so every block's (bo + bi - 1)-slice is in-bounds: bi
    # zeros in front (left-edge partial blocks), the tail covers
    # right-edge partial blocks.  Out-of-range T entries multiply the
    # zero-padding of x or land in discarded rows, so their value is
    # irrelevant — only the slice bounds matter.
    s_ext = jnp.concatenate([
        jnp.zeros((bi,), s.dtype), s,
        jnp.zeros((max(nI * bo - n_out, 0) + bo,), s.dtype),
    ])
    x = jnp.pad(bits, ((0, 0), (0, nJ * bi - n_in))).astype(jnp.bfloat16)
    xT = x.T.reshape(nJ, bi, B)  # [nJ, bi, B] chunked frames

    L = bo + bi - 1  # distinct values per Toeplitz tile

    def toeplitz_tile(local):
        """[L] slice -> [bo, bi] tile with tile[a, b] = local[a - b + bi - 1],
        using only contiguous copies (no gathers): tiling a
        period-(L + 1) sequence into rows of length L shears each row's
        phase by one — tile(v, bo).reshape(bo, L)[a, j] = v[(j - a) mod
        (L + 1)] — so with v = flip(local) + one junk element, columns
        [bo - 1, bo - 1 + bi) are exactly the Toeplitz tile.  (A gather
        formulation of the same tile was ~100x slower on TPU: 4M
        single-element descriptors per block.)
        """
        v = jnp.concatenate([jnp.flip(local), jnp.zeros((1,), local.dtype)])
        t = jnp.broadcast_to(v, (bo, L + 1)).reshape(-1)[: bo * L]
        return t.reshape(bo, L)[:, bo - 1 : bo - 1 + bi]

    def row_block(I):
        def body(acc, J):
            # Block (I, J) holds s[I*bo + a - (J*bi + b) + n_in - 1]
            # = s_ext[start + a - b + bi - 1], start = I*bo - J*bi + n_in.
            start = I * bo - J * bi + n_in
            local = jax.lax.dynamic_slice(s_ext, (start,), (L,))
            Tb = toeplitz_tile(local).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                Tb, xT[J], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((bo, B), jnp.float32),
            jnp.arange(nJ, dtype=jnp.int32),
        )
        return (acc.astype(jnp.int32) & 1).astype(jnp.uint8)

    y = jax.lax.map(row_block, jnp.arange(nI, dtype=jnp.int32))  # [nI, bo, B]
    return y.reshape(nI * bo, B)[:n_out].T


# Above this many T entries the dense path materializes an unreasonable
# matrix (2^26 bf16 = 128 MB) and the streaming path takes over.
_DENSE_LIMIT = 1 << 26


def toeplitz_hash(
    bits: jax.Array,
    seed_key: jax.Array,
    n_out: int,
    block_out: int = 512,
    block_in: int = 8192,
    method: str = "auto",  # "auto" | "dense" | "blocked"
) -> jax.Array:
    """Hash key frames [B, n] (or [n]) to [B, n_out] (or [n_out]) bits.

    ``method='auto'`` uses the dense matmul for tag-sized work and the
    streaming block-Toeplitz path once T would exceed ~128 MB; both
    paths produce bit-identical output for the same seed.
    """
    arr = jnp.atleast_2d(jnp.asarray(bits, jnp.uint8))
    n_in = arr.shape[-1]
    if method == "auto":
        method = "dense" if n_in * n_out <= _DENSE_LIMIT else "blocked"
    if method == "dense":
        T = toeplitz_matrix(seed_key, n_in, n_out)
        out = _hash_apply(T, arr)
    elif method == "blocked":
        s = jax.random.bernoulli(seed_key, 0.5, (n_in + n_out - 1,)).astype(
            jnp.bfloat16
        )
        out = _hash_apply_blocked(
            s, arr, n_in, n_out, min(block_out, n_out), min(block_in, n_in)
        )
    else:
        raise ValueError(f"Unknown method {method!r}")
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
