"""Production serving wrapper for the reconciliation step.

The simulation stack (sim/) plays both Alice and Bob; a deployed QKD
post-processing node is ONE side of the protocol with a network boundary
in between (the reference scopes this exactly at its function boundary,
``QKD_LDPC_regular``, src/qkd_ldpc_algorithm.cpp:347-396 — see
decoder/reconcile.py).  This module packages that boundary as a
long-lived object with a serving-shaped contract:

- **One compile, any request size**: the decode program is compiled once
  for a fixed lane count; requests are padded (and chunked) to it, so a
  stream of ragged request sizes never recompiles.  QBER is a traced
  argument — channel-estimate updates don't recompile either.
- **Host-friendly IO**: NumPy in, NumPy out, one device round-trip per
  chunk.
- **Both roles**: `syndromes()` is Alice's side (compute the syndromes
  to transmit); `reconcile()` is Bob's (correct the noisy key toward the
  received syndromes).  `leak_bits` reports the information disclosed
  per frame for the privacy-amplification budget
  (qkd_ldpc_tpu.postprocess carries the remaining chain: verification
  tags + key compression).
- **Rate adaptation**: pass ``adapter=RateAdapter(...)`` to serve an
  adapted rate over the mother code — requests then carry payload bits,
  punctured positions are decoder-recovered erasures, and the leakage
  accounting follows the adapter.

Example::

    rec = Reconciler(code, DecodeOptions(message_dtype="bfloat16"))
    rec.warmup()                        # optional: pay the compile now
    syn = rec.syndromes(alice_bits)     # Alice -> (classical channel)
    out = rec.reconcile(bob_bits, syn, qber=0.04)   # Bob
    corrected, ok = out.bits, out.syndromes_match
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode
from qkd_ldpc_tpu.decoder.bp import DecodeOptions, bp_decode_batch_last
from qkd_ldpc_tpu.decoder.rate_adapt import RateAdapter
from qkd_ldpc_tpu.decoder.reconcile import apriori_llr
from qkd_ldpc_tpu.decoder.syndrome import syndrome as syndrome_fn


class ServeResult(NamedTuple):
    """Host-side reconciliation outcome (NumPy)."""

    bits: np.ndarray  # [n, frame_bits] uint8 corrected key (payload
    # bits on a rate-adapted endpoint)
    iterations: np.ndarray  # [n] int32
    syndromes_match: np.ndarray  # [n] bool — verify before using the key!


@partial(jax.jit, static_argnames=("opts",))
def _serve_step(code, bob, syn, qber, opts):
    llr = apriori_llr(bob, qber)
    z, iters, ok = bp_decode_batch_last(
        code, llr.T, syn.T.astype(jnp.int8), opts
    )
    return z.T.astype(jnp.uint8), iters, ok


@partial(jax.jit, static_argnames=("opts",))
def _serve_step_llr(code, llr, syn, opts):
    z, iters, ok = bp_decode_batch_last(
        code, llr.T, syn.T.astype(jnp.int8), opts
    )
    return z.T.astype(jnp.uint8), iters, ok


@jax.jit
def _syndrome_step(code, bits):
    return syndrome_fn(code, bits)


class Reconciler:
    """Long-lived reconciliation endpoint bound to one code + options.

    ``lanes`` is the compiled batch width; requests of any size are
    padded/chunked to it.  Latency/throughput trade-off: small lanes for
    low latency, large for throughput (measured: benchmarks/serving.md).
    """

    def __init__(
        self,
        code: LDPCCode,
        opts: DecodeOptions = DecodeOptions(),
        lanes: int = 128,
        adapter: RateAdapter | None = None,
        shared_seed: int = 0,
    ):
        """``adapter`` serves an adapted rate over the mother ``code``
        (decoder.rate_adapt): requests then carry PAYLOAD bits
        (``adapter.payload_bits`` per frame), punctured positions are
        erasures recovered by the decoder, and ``shared_seed`` fixes the
        shortened pattern both sides derive."""
        if lanes < 1:
            raise ValueError("lanes must be >= 1")
        if adapter is not None and adapter.code is not code:
            if (adapter.code.n_vars, adapter.code.n_checks) != (
                code.n_vars, code.n_checks
            ):
                raise ValueError("adapter was built for a different code")
        self.code = code.to_device()
        self.opts = opts
        self.lanes = lanes
        self.adapter = adapter
        self.shared_seed = shared_seed

    @property
    def frame_bits(self) -> int:
        """Bits per request frame (payload bits when rate-adapted)."""
        if self.adapter is not None:
            return self.adapter.payload_bits
        return self.code.n_vars

    @property
    def syndrome_bits(self) -> int:
        return self.code.n_checks

    @property
    def leak_bits(self) -> int:
        """Information disclosed per frame, for the privacy-
        amplification budget (syndrome bits, net of punctured entropy
        when rate-adapted)."""
        if self.adapter is not None:
            return self.adapter.leak_bits
        return self.code.n_checks

    def warmup(self) -> "Reconciler":
        """Compile both directions now (first call is otherwise slow)."""
        bob = np.zeros((1, self.frame_bits), np.uint8)
        syn = self.syndromes(bob, frame_key=jax.random.PRNGKey(0))
        self.reconcile(bob, syn, qber=0.01)
        return self

    def syndromes(self, bits, frame_key=None) -> np.ndarray:
        """Alice side: syndromes [n, M] of key frames [n, frame_bits]
        (or 1-D).  Rate-adapted endpoints assemble the full mother-code
        frame first; ``frame_key`` supplies Alice's PRIVATE randomness
        for punctured positions (required when the adapter punctures)."""
        arr = np.asarray(bits, np.uint8)
        single = arr.ndim == 1
        if single:
            arr = arr[None]
        if arr.shape[-1] != self.frame_bits:
            raise ValueError(
                f"expected {self.frame_bits}-bit frames, got {arr.shape[-1]}"
            )
        if self.adapter is not None:
            if self.adapter.punct_idx.size and frame_key is None:
                raise ValueError(
                    "frame_key (Alice's private randomness for punctured "
                    "bits) is required on a punctured endpoint"
                )
            frames = self.adapter.build_frames(
                jnp.asarray(arr),
                frame_key if frame_key is not None else jax.random.PRNGKey(0),
                self.shared_seed,
            )
            out = np.asarray(_syndrome_step(self.code, frames))
        else:
            out = np.asarray(_syndrome_step(self.code, jnp.asarray(arr)))
        return out[0] if single else out

    def reconcile(self, bob_bits, alice_syndromes, qber: float) -> ServeResult:
        """Bob side: correct noisy frames toward received syndromes.

        ``syndromes_match[i]`` False means frame i did NOT verify — it
        must be discarded (or retried at a lower rate), never used as key
        material.
        """
        bob = np.asarray(bob_bits, np.uint8)
        syn = np.asarray(alice_syndromes)
        single = bob.ndim == 1
        if single:
            bob, syn = bob[None], syn[None]
        if bob.shape[-1] != self.frame_bits:
            raise ValueError(
                f"expected {self.frame_bits}-bit frames, got {bob.shape[-1]}"
            )
        if syn.shape != (bob.shape[0], self.syndrome_bits):
            raise ValueError(
                f"expected syndromes [{bob.shape[0]}, {self.syndrome_bits}], "
                f"got {syn.shape}"
            )
        if not (0.0 < qber < 1.0):
            raise ValueError("qber must be in (0, 1)")

        n = bob.shape[0]
        bits = np.empty((n, self.frame_bits), np.uint8)
        iters = np.empty((n,), np.int32)
        ok = np.empty((n,), bool)
        q = jnp.asarray(qber, jnp.float32)
        key_idx = (jnp.asarray(self.adapter.key_idx)
                   if self.adapter is not None else None)
        for off in range(0, n, self.lanes):
            chunk = min(self.lanes, n - off)
            pad = self.lanes - chunk
            b = np.pad(bob[off:off + chunk], ((0, pad), (0, 0)))
            s = np.pad(syn[off:off + chunk], ((0, pad), (0, 0)))
            if self.adapter is not None:
                llr = self.adapter.llr(jnp.asarray(b), q, self.shared_seed)
                z, it, okd = _serve_step_llr(
                    self.code, llr, jnp.asarray(s), self.opts
                )
                z = jnp.take(z, key_idx, axis=1)
            else:
                z, it, okd = _serve_step(
                    self.code, jnp.asarray(b), jnp.asarray(s), q, self.opts
                )
            # one blocking fetch per chunk
            z, it, okd = np.asarray(z), np.asarray(it), np.asarray(okd)
            bits[off:off + chunk] = z[:chunk]
            iters[off:off + chunk] = it[:chunk]
            ok[off:off + chunk] = okd[:chunk]
        res = ServeResult(bits=bits, iterations=iters, syndromes_match=ok)
        if single:
            res = ServeResult(res.bits[0], res.iterations[0],
                              res.syndromes_match[0])
        return res
