"""Exact-weight channel cost: Pallas threshold kernel vs XLA (round 3).

The channel's k-th-smallest threshold search is 32 sequential passes
over the [B, N] score tensor; as XLA ops each pass re-streams it from
HBM (~32 x 21 MB at the flagship shape).  The Pallas kernel
(channel/pallas_select.py) holds each row block in VMEM across all 32
passes.  Measures, interleaved: the threshold search alone (both
paths), and the full trial generation (keygen + channel) which embeds
it.

Usage (on the TPU): python benchmarks/channel_bench.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.roofline import measure_null_roundtrip, timed


@partial(jax.jit, static_argnames=("reps", "pallas"))
def _thresh_chain(scores, k, reps, pallas):
    from qkd_ldpc_tpu.channel.keys import _kth_smallest
    from qkd_ldpc_tpu.channel.pallas_select import kth_smallest_pallas

    def body(c, _):
        s = scores ^ c  # vary input to defeat CSE; order-preserving xor
        t = (kth_smallest_pallas(s, k) if pallas
             else _kth_smallest(s, k))
        return t[:1, :1].astype(jnp.uint32), None

    out, _ = jax.lax.scan(body, jnp.zeros((1, 1), jnp.uint32), None,
                          length=reps)
    return out[0, 0]


@partial(jax.jit, static_argnames=("n_bits", "batch", "reps"))
def _trial_chain(point_key, num_errors, n_bits, batch, reps):
    from qkd_ldpc_tpu.channel.keys import make_trial_batch

    def body(c, i):
        a, b = make_trial_batch(point_key, n_bits, batch, num_errors,
                                trial_offset=i * batch)
        return c + jnp.sum(b[:1, :8].astype(jnp.int32)), None

    out, _ = jax.lax.scan(body, jnp.asarray(0, jnp.int32),
                          jnp.arange(reps, dtype=jnp.int32))
    return out


def main():
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B, N, reps = 512, 10240, 50
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.integers(0, 2**32, (B, N), dtype=np.uint32))
    k = jnp.asarray(512, jnp.int32)
    rt = measure_null_roundtrip()
    print(f"device: {jax.devices()[0]}  B={B} N={N} reps={reps}  "
          f"null rt {rt*1e3:.1f} ms")

    # correctness on hardware first
    from qkd_ldpc_tpu.channel.keys import _kth_smallest
    from qkd_ldpc_tpu.channel.pallas_select import kth_smallest_pallas

    ref = np.asarray(_kth_smallest(scores, k))
    out = np.asarray(kth_smallest_pallas(scores, k))
    assert (ref == out).all(), "hardware kernel mismatch!"
    print("hardware threshold parity: OK")

    for label, pallas in (("xla 32-pass", False), ("pallas vmem", True)):
        t = timed(lambda: _thresh_chain(scores, k, reps, pallas)) / reps
        print(f"threshold {label:12s}: {t*1e3:.3f} ms/search")

    key = jax.random.PRNGKey(7)
    ne = jnp.asarray(512, jnp.int32)
    t = timed(lambda: _trial_chain(key, ne, N, B, reps)) / reps
    print(f"full trial generation (keygen+channel, pallas path): "
          f"{t*1e3:.3f} ms/batch of {B}")


if __name__ == "__main__":
    main()
