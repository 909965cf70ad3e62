"""Rate-adaptive reconciliation: puncturing + shortening over one code.

The reference ships fixed-rate codes and picks a QBER sweep per rate
(``get_rate_based_QBER_range``, src/simulation.cpp:48-70); a production
QKD post-processor instead holds ONE mother code and adapts its
effective rate to the drifting channel, following the standard
puncturing/shortening construction (Elkouss et al., "Rate compatible
protocol for information reconciliation"; Martinez-Mateo et al.).  This
module implements that construction on top of the unmodified decoder —
rate adaptation is pure LLR bookkeeping, so the hot path is untouched:

- An N-bit mother-code frame is split into ``key`` positions (the
  ℓ = N − p − s payload), ``punctured`` positions (p bits Alice fills
  from her PRIVATE randomness; Bob knows nothing about them — erasures,
  LLR 0 — and recovers them through the code constraints), and
  ``shortened`` positions (s bits both sides derive from a SHARED seed —
  known, LLR ±B with a large B).
- Alice transmits the M-bit syndrome of the full frame.  Bob decodes his
  noisy payload toward it with the erasure/known LLRs in place and takes
  the corrected key from the payload positions.
- Effective rate on the payload channel:
  ``R_eff = 1 − (M − p) / (N − p − s)`` — each punctured bit adds one
  unknown, cancelling one syndrome equation; each shortened bit removes
  a payload position at no information cost.  Shortening LOWERS the rate
  (tolerates higher QBER); puncturing RAISES it (leaks less at lower
  QBER).  Conservative leakage for the privacy-amplification budget is
  ``M − p`` bits per frame.

Position choice: a seeded uniform permutation of the mother code's
variable nodes (both sides derive it from the shared seed).  Structured
(untainted / ACE-aware) puncturing patterns outperform random ones near
capacity; the pattern is injectable via ``punctured``/``shortened``
index arrays for codes that ship one.

Measured FER-vs-QBER envelope of one mother code across rates:
benchmarks/rate_adapt.md.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode
from qkd_ldpc_tpu.decoder.bp import DecodeOptions
from qkd_ldpc_tpu.decoder.reconcile import apriori_llr
from qkd_ldpc_tpu.decoder.syndrome import syndrome as syndrome_fn

# LLR magnitude pinning a shortened (known) bit.  Large enough to
# dominate any channel LLR, small enough to stay exact in bf16 and
# below the default ±100 message clip.
_KNOWN_LLR = 64.0


@dataclasses.dataclass(frozen=True)
class RateAdapter:
    """Puncturing/shortening plan over a mother code (both sides build
    the identical plan from ``(code, n_punctured, n_shortened, seed)``)."""

    code: LDPCCode
    key_idx: np.ndarray  # [l] payload positions
    punct_idx: np.ndarray  # [p] punctured positions
    short_idx: np.ndarray  # [s] shortened positions

    @staticmethod
    def make(
        code: LDPCCode,
        n_punctured: int = 0,
        n_shortened: int = 0,
        seed: int = 0,
        punctured: np.ndarray | None = None,
        shortened: np.ndarray | None = None,
    ) -> "RateAdapter":
        N = code.n_vars
        if punctured is not None or shortened is not None:
            p_idx = np.asarray(punctured if punctured is not None else [], np.int64)
            s_idx = np.asarray(shortened if shortened is not None else [], np.int64)
        else:
            d = n_punctured + n_shortened
            if d >= N:
                raise ValueError("punctured + shortened must leave payload bits")
            perm = np.random.default_rng(seed).permutation(N)
            p_idx = np.sort(perm[:n_punctured])
            s_idx = np.sort(perm[n_punctured:d])
        both = np.concatenate([p_idx, s_idx])
        if both.size != np.unique(both).size:
            raise ValueError("punctured and shortened positions overlap")
        if both.size and (both.min() < 0 or both.max() >= N):
            raise ValueError("position out of range")
        mask = np.ones(N, bool)
        mask[both] = False
        return RateAdapter(
            code=code,
            key_idx=np.flatnonzero(mask),
            punct_idx=np.asarray(p_idx, np.int64),
            short_idx=np.asarray(s_idx, np.int64),
        )

    # --- accounting --------------------------------------------------------

    @property
    def payload_bits(self) -> int:
        return self.key_idx.size

    @property
    def effective_rate(self) -> float:
        """R_eff = 1 - (M - p) / (N - p - s) on the payload channel."""
        return 1.0 - (self.code.n_checks - self.punct_idx.size) / self.payload_bits

    @property
    def leak_bits(self) -> int:
        """Syndrome bits minus punctured entropy: the (conservative)
        disclosure per frame for privacy amplification."""
        return self.code.n_checks - self.punct_idx.size

    # --- frame construction (Alice side / simulation) ----------------------

    def build_frames(
        self,
        key_bits: jax.Array,  # [B, l] payload
        frame_key: jax.Array,  # PRNG key: Alice's PRIVATE punctured bits
        shared_seed: int = 0,  # shortened pattern (both sides)
    ) -> jax.Array:
        """Assemble full N-bit frames [B, l] -> [B, N] (uint8)."""
        key_bits = jnp.asarray(key_bits, jnp.uint8)
        B = key_bits.shape[0]
        N = self.code.n_vars
        frame = jnp.zeros((B, N), jnp.uint8)
        frame = frame.at[:, jnp.asarray(self.key_idx)].set(key_bits)
        if self.punct_idx.size:
            pb = jax.random.bernoulli(
                frame_key, 0.5, (B, self.punct_idx.size)
            ).astype(jnp.uint8)
            frame = frame.at[:, jnp.asarray(self.punct_idx)].set(pb)
        if self.short_idx.size:
            frame = frame.at[:, jnp.asarray(self.short_idx)].set(
                self.short_pattern(shared_seed)[None, :]
            )
        return frame

    def short_pattern(self, shared_seed: int = 0) -> jax.Array:
        """The shared known bit pattern for the shortened positions."""
        if not self.short_idx.size:
            return jnp.zeros((0,), jnp.uint8)
        return jax.random.bernoulli(
            jax.random.PRNGKey(shared_seed), 0.5, (self.short_idx.size,)
        ).astype(jnp.uint8)

    def syndromes(self, frames: jax.Array) -> jax.Array:
        """Alice -> Bob transmission: syndromes of the full frames."""
        return syndrome_fn(self.code, frames)

    # --- Bob side -----------------------------------------------------------

    def llr(
        self,
        bob_key_bits: jax.Array,  # [B, l] Bob's noisy payload
        qber,
        shared_seed: int = 0,
    ) -> jax.Array:
        """Full-frame LLRs: channel LLRs at payload positions, 0 at
        punctured (erasure), +-_KNOWN_LLR at shortened (known bits)."""
        bob_key_bits = jnp.asarray(bob_key_bits, jnp.uint8)
        B = bob_key_bits.shape[0]
        N = self.code.n_vars
        llr = jnp.zeros((B, N), jnp.float32)
        llr = llr.at[:, jnp.asarray(self.key_idx)].set(
            apriori_llr(bob_key_bits, qber)
        )
        if self.short_idx.size:
            known = self.short_pattern(shared_seed)
            pinned = jnp.where(known == 1, -_KNOWN_LLR, _KNOWN_LLR)
            llr = llr.at[:, jnp.asarray(self.short_idx)].set(pinned[None, :])
        return llr

    def reconcile(
        self,
        bob_key_bits: jax.Array,  # [B, l] or [l]
        alice_syndromes: jax.Array,  # [B, M] or [M]
        qber,
        opts: DecodeOptions = DecodeOptions(),
        shared_seed: int = 0,
    ):
        """Bob: decode toward Alice's syndromes; returns (key [.., l] uint8,
        iterations, syndromes_match)."""
        single = jnp.asarray(bob_key_bits).ndim == 1
        bob = jnp.atleast_2d(jnp.asarray(bob_key_bits, jnp.uint8))
        syn = jnp.atleast_2d(jnp.asarray(alice_syndromes))
        llr_full = self.llr(bob, qber, shared_seed)
        # reconcile_with_syndrome builds llr itself from bits; feed the
        # decoder directly with our full-frame LLRs instead.
        from qkd_ldpc_tpu.decoder.bp import decode

        res = decode(self.code, llr_full, syn, opts)
        key = jnp.take(res.bits, jnp.asarray(self.key_idx), axis=1).astype(jnp.uint8)
        if single:
            return key[0], res.iterations[0], res.syndromes_match[0]
        return key, res.iterations, res.syndromes_match
