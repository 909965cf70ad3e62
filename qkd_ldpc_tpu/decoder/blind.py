"""Blind reconciliation: interactive rate adaptation without a QBER estimate.

The rate-adapted protocol (decoder/rate_adapt.py) picks (p, s) from an
estimated QBER up front.  BLIND reconciliation (Martinez-Mateo, Elkouss,
Martin, "Blind reconciliation", QIC 2012) removes the estimate: start
with all d modulated positions PUNCTURED (the highest rate), and on
decode failure Alice progressively REVEALS punctured bits — converting
them into shortened (known) positions — until Bob's decode verifies or
the budget is exhausted.  Frames on good channels finish in round 0 and
leak only ``M − d`` bits; bad frames pay reveals as they go.  Leakage is
therefore adaptive per frame with no channel estimation round at all:

    leak_i = M − d + 2·r_i·step ... conservatively accounted here as
    ``M − d + 2·revealed_i`` (each revealed bit both discloses its value
    and unlocks the syndrome equation it was shielding; the standard
    accounting in the blind-reconciliation literature).

The decoder is reused unchanged; each round is one batched decode with
updated LLRs, and frames that already verified are frozen (their keys
and leakage stop changing — masked, exactly like the batch runner's
early-exit bookkeeping).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode
from qkd_ldpc_tpu.decoder.bp import DecodeOptions, decode
from qkd_ldpc_tpu.decoder.rate_adapt import _KNOWN_LLR, RateAdapter
from qkd_ldpc_tpu.decoder.reconcile import apriori_llr


class BlindResult(NamedTuple):
    key: np.ndarray  # [B, l] uint8 corrected payload
    ok: np.ndarray  # [B] bool — verified frames (use ONLY these)
    rounds: np.ndarray  # [B] int32 — reveal rounds consumed per frame
    leak_bits: np.ndarray  # [B] int32 — per-frame disclosure
    iterations: np.ndarray  # [B] int32 — decode iterations of the final round


class SecureBlindResult(NamedTuple):
    """Outcome of the full blind post-processing chain (round 4).

    Frames carry RAGGED final key lengths — the whole point of blind
    reconciliation is per-frame adaptive leakage, so frames that needed
    reveals yield shorter final keys.  Row i's key material is
    ``key[i, :final_bits[i]]``; everything past it is zeroed.  A caller
    wanting a uniform batch length may truncate every verified row to
    ``final_bits[verified].min()`` (the worst-case-of-batch policy) —
    truncating a Toeplitz hash output is itself a Toeplitz hash (the
    first rows of T), so both policies are 2-universal.
    """

    key: np.ndarray  # [B, max(final_bits)] uint8 amplified key material
    final_bits: np.ndarray  # [B] int32 per-frame length (0 if unverified)
    verified: np.ndarray  # [B] bool: syndromes AND tags matched
    rounds: np.ndarray  # [B] int32 reveal rounds consumed
    leak_bits: np.ndarray  # [B] int32 ledger: syndrome net of punctured
    # entropy + 2x reveals + tag bits
    iterations: np.ndarray  # [B] int32


class BlindSession:
    """Endpoint-shaped Bob-side blind reconciliation (round 3).

    The interactive loop with control INVERTED for serving: the caller
    owns the classical channel.  One session per request batch::

        s = BlindSession(adapter, bob_payload, alice_syndromes)
        pos = s.begin()                 # None, or positions to request
        while pos is not None:
            pos = s.provide(values)     # Alice's bits for `pos`, [B, k]
        out = s.result()                # BlindResult

    ``adapter`` must be all-punctured (``n_shortened == 0``): its
    punctured positions are the reveal budget.  ``qber_hint`` only
    shapes the channel LLR magnitude — the protocol needs no QBER
    estimate; a generic hint works across the code's whole range.
    """

    def __init__(
        self,
        adapter: RateAdapter,
        bob_payload,  # [B, l] Bob's noisy payload bits
        alice_syndromes,  # [B, M]
        qber_hint: float = 0.05,
        opts: DecodeOptions = DecodeOptions(),
        reveal_step: int | None = None,
        max_rounds: int | None = None,
    ):
        if adapter.short_idx.size:
            raise ValueError("blind reconciliation starts all-punctured")
        self.d = d = adapter.punct_idx.size
        if d == 0:
            raise ValueError("adapter has no punctured budget to reveal")
        self.adapter = adapter
        self.opts = opts
        self.step = reveal_step or max(1, d // 4)
        self.n_rounds = (
            max_rounds if max_rounds is not None else -(-d // self.step)
        )

        bob = jnp.atleast_2d(jnp.asarray(bob_payload, jnp.uint8))
        self.syn = jnp.atleast_2d(jnp.asarray(alice_syndromes))
        B = bob.shape[0]
        self.llr = jnp.zeros((B, adapter.code.n_vars), jnp.float32).at[
            :, jnp.asarray(adapter.key_idx)
        ].set(apriori_llr(bob, qber_hint))

        self.key = np.zeros((B, adapter.payload_bits), np.uint8)
        self.ok = np.zeros((B,), bool)
        self.rounds = np.zeros((B,), np.int32)
        self.iters = np.zeros((B,), np.int32)
        self.revealed = 0
        self.r = 0
        self._key_idx = jnp.asarray(adapter.key_idx)
        self._pending: np.ndarray | None = None
        self._finished = False
        # Frozen decisions of verified frames ([B, N]); once a frame
        # verifies, later rounds decode it from its pinned decisions —
        # it converges on the peeled first iteration and stops extending
        # the batch's while_loop (round-2 weakness: every round re-ran
        # verified frames' full trajectories).  Bookkeeping only ever
        # reads a frame's FIRST verifying round, so results are
        # unchanged (tested: test_blind_freeze_semantics).
        self._frozen_llr = None

    def begin(self) -> np.ndarray | None:
        """Run round 0; returns positions to request from Alice, or
        None when every frame already verified (or no budget/rounds)."""
        if self.r != 0 or self._pending is not None:
            raise RuntimeError("begin() must be the first call, once")
        return self._decode_round()

    def provide(self, values) -> np.ndarray | None:
        """Feed Alice's bits [B, k] for the last requested positions;
        runs the next round.  Returns the next request or None (done)."""
        if self._pending is None:
            raise RuntimeError("no pending reveal request")
        pos = self._pending
        self._pending = None
        values = np.asarray(values, np.uint8)
        pinned = jnp.where(jnp.asarray(values) == 1, -_KNOWN_LLR, _KNOWN_LLR)
        self.llr = self.llr.at[:, jnp.asarray(pos)].set(
            pinned.astype(jnp.float32)
        )
        self.revealed += pos.size
        self.r += 1
        return self._decode_round()

    def result(self) -> BlindResult:
        if not self._finished:
            raise RuntimeError("session still has pending rounds")
        # Per-frame leakage: syndrome entropy net of the still-secret
        # punctured bits at the frame's finishing round, plus the
        # revealed values themselves.
        M = self.adapter.code.n_checks
        leak = M - self.d + 2 * np.minimum(
            self.rounds * self.step, self.d
        ).astype(np.int32)
        return BlindResult(key=self.key, ok=self.ok, rounds=self.rounds,
                           leak_bits=leak, iterations=self.iters)

    def finalize(
        self,
        alice_tags,
        tag_key,
        pa_key,
        tag_bits: int = 64,
        security_bits: int = 100,
    ) -> SecureBlindResult:
        """Complete the secure chain on a finished session: verification
        tags (compared against Alice's) -> privacy amplification, with
        the per-frame ADAPTIVE leakage ledger (reveals included) setting
        each frame's final key length.

        ``alice_tags`` [B, tag_bits] arrive over the classical channel
        (Alice: ``postprocess.verification_tags`` over her payload with
        the shared ``tag_key``); ``pa_key`` is the shared amplification
        seed.  All frames hash through the same max-length Toeplitz
        matrix; frame i keeps its first ``final_bits[i]`` output bits —
        a prefix of Toeplitz rows is itself a 2-universal Toeplitz hash,
        so the ragged lengths cost nothing extra.
        """
        from qkd_ldpc_tpu.postprocess import privacy_amplify, toeplitz_hash

        res = self.result()  # raises unless finished
        B = res.key.shape[0]
        a_tags = np.atleast_2d(np.asarray(alice_tags, np.uint8))
        if a_tags.shape != (B, tag_bits):
            raise ValueError(
                f"expected alice_tags [{B}, {tag_bits}], got {a_tags.shape}"
            )
        bob_tags = np.asarray(
            toeplitz_hash(jnp.asarray(res.key), tag_key, tag_bits)
        )
        verified = res.ok & (bob_tags == a_tags).all(axis=-1)

        # Per-frame ledger: reconciliation disclosure (syndrome net of
        # still-punctured entropy + 2x reveals, from result()) + the tag.
        leak = res.leak_bits + tag_bits
        payload = self.adapter.payload_bits
        final = np.maximum(payload - leak - security_bits, 0).astype(np.int32)
        final[~verified] = 0
        max_bits = int(final.max()) if B else 0
        if max_bits > 0:
            key = np.asarray(
                privacy_amplify(jnp.asarray(res.key), pa_key, max_bits)
            )
            col = np.arange(max_bits)[None, :]
            key = np.where(col < final[:, None], key, 0).astype(np.uint8)
        else:
            key = np.zeros((B, 0), np.uint8)
        return SecureBlindResult(
            key=key, final_bits=final, verified=verified, rounds=res.rounds,
            leak_bits=leak, iterations=res.iterations,
        )

    def _decode_round(self) -> np.ndarray | None:
        llr_use = self.llr if self._frozen_llr is None else jnp.where(
            jnp.asarray(self.ok)[:, None], self._frozen_llr, self.llr
        )
        res = decode(self.adapter.code, llr_use, self.syn, self.opts)
        ok_now = np.asarray(res.syndromes_match)
        newly = ok_now & ~self.ok
        if newly.any():
            key_hat = np.asarray(
                jnp.take(res.bits, self._key_idx, axis=1).astype(jnp.uint8)
            )
            self.key[newly] = key_hat[newly]
            self.rounds[newly] = self.r
            self.iters[newly] = np.asarray(res.iterations)[newly]
            self.ok |= newly
            pinned_bits = jnp.where(
                res.bits == 1, -_KNOWN_LLR, _KNOWN_LLR
            ).astype(jnp.float32)
            self._frozen_llr = (
                pinned_bits if self._frozen_llr is None
                else jnp.where(jnp.asarray(newly)[:, None], pinned_bits,
                               self._frozen_llr)
            )
        if (self.ok.all() or self.revealed >= self.d
                or self.r == self.n_rounds):
            self.iters[~self.ok] = np.asarray(res.iterations)[~self.ok]
            self.rounds[~self.ok] = self.r
            self._finished = True
            return None
        self._pending = np.asarray(
            self.adapter.punct_idx[self.revealed:self.revealed + self.step]
        )
        return self._pending


def blind_reconcile(
    adapter: RateAdapter,
    bob_payload,  # [B, l] Bob's noisy payload bits
    alice_syndromes,  # [B, M]
    reveal: Callable[[np.ndarray], np.ndarray],
    qber_hint: float = 0.05,
    opts: DecodeOptions = DecodeOptions(),
    reveal_step: int | None = None,
    max_rounds: int | None = None,
) -> BlindResult:
    """Bob-side blind reconciliation loop (callback form).

    ``reveal(positions)`` is the Alice oracle: given frame positions (a
    [k] index array into the mother frame), return the true bits [B, k]
    (one classical message per round).  Serving deployments where the
    caller owns the channel use :class:`BlindSession` directly.
    """
    s = BlindSession(
        adapter, bob_payload, alice_syndromes, qber_hint=qber_hint,
        opts=opts, reveal_step=reveal_step, max_rounds=max_rounds,
    )
    pos = s.begin()
    while pos is not None:
        pos = s.provide(reveal(pos))
    return s.result()


def blind_reconcile_sim(
    code: LDPCCode,
    alice_payload,  # [B, l]
    bob_payload,  # [B, l]
    n_punctured: int,
    qber_hint: float = 0.05,
    opts: DecodeOptions = DecodeOptions(),
    reveal_step: int | None = None,
    seed: int = 0,
    frame_key=None,
) -> tuple[BlindResult, np.ndarray]:
    """Simulation convenience: plays Alice (private punctured bits,
    truthful reveals) and returns (result, keys_match oracle)."""
    adapter = RateAdapter.make(code, n_punctured=n_punctured, seed=seed)
    alice = jnp.atleast_2d(jnp.asarray(alice_payload, jnp.uint8))
    if frame_key is None:
        frame_key = jax.random.PRNGKey(seed + 1)
    frames = adapter.build_frames(alice, frame_key)
    syn = adapter.syndromes(frames)
    frames_np = np.asarray(frames)

    def reveal(positions: np.ndarray) -> np.ndarray:
        return frames_np[:, positions]

    res = blind_reconcile(
        adapter, bob_payload, syn, reveal, qber_hint=qber_hint, opts=opts,
        reveal_step=reveal_step,
    )
    keys_match = (res.key == np.asarray(alice)).all(axis=1) & res.ok
    return res, keys_match
