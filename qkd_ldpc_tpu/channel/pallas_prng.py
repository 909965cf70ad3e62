"""On-device trial randomness: per-trial hardware PRNG (contract v2).

Trial generation under the v1 threefry contract spends ~1.0 ms per
512-trial batch on counter-based bit blocks (the [B, N] Alice keys and
error scores dominate; the key-derivation tree itself is negligible) —
about a fifth of the whole flagship pipeline (VERDICT r3 item 1).  This
kernel keeps the threefry key-derivation TREE — per-point and per-trial
``fold_in`` exactly as in v1, so trial independence and chunk/shard
invariance hold by construction — and swaps only the per-trial bit
BLOCKS for the TPU's hardware PRNG (``pltpu.prng_random_bits``), seeded
per trial with 64 threefry-derived bits.

Determinism contract v2 (``prng="pallas"``): results are bit-for-bit
reproducible for a fixed (master seed, trial index, frame size) on a
fixed platform and compiler version — including across batch sizes,
chunkings, and mesh shardings, because every trial's stream depends
only on its own derived seed.  Unlike v1, the streams are NOT portable
across platforms or compiler versions (the hardware generator is
implementation-defined); the canonical reference-parity sweeps pin v1.
Statistical parity (FER / iteration moments) vs v1 is measured in
``benchmarks/prng.md``.

Non-TPU backends have no hardware path; callers fall back to v1
(channel.keys.make_trials_from_ids).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@partial(jax.jit, static_argnames=("n_bits", "group"))
def trial_words_pallas(
    seeds: jax.Array,  # [B, 2] int32 per-trial seed words (threefry-derived)
    n_bits: int,
    group: int = 8,  # trials per kernel program (amortizes program setup)
) -> tuple[jax.Array, jax.Array]:
    """Per-trial random words: (bit_words, score_words), each [B, n_bits]
    uint32.  Trial b's two rows are a pure function of ``seeds[b]`` —
    position in the batch is irrelevant (re-seeded per trial inside the
    kernel), which is what makes the v2 contract chunk/shard invariant.
    """
    B = seeds.shape[0]
    n_pad = (-n_bits) % 128
    Np = n_bits + n_pad
    g = group
    while B % g:
        g //= 2
    n_groups = B // g

    def kern(seed_ref, out_ref):
        base = pl.program_id(0) * g

        def body(i, _):
            pltpu.prng_seed(seed_ref[base + i, 0], seed_ref[base + i, 1])
            # prng_random_bits returns int32; the ref is uint32 — bitcast
            # explicitly (a dtype-mismatched store is lowering-dependent
            # behavior we must not rely on).
            out_ref[pl.ds(i, 1)] = pltpu.bitcast(
                pltpu.prng_random_bits((1, 2, Np)), jnp.uint32
            )
            return 0

        jax.lax.fori_loop(0, g, body, 0)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 2, Np), jnp.uint32),
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((g, 2, Np), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(seeds)
    return out[:, 0, :n_bits], out[:, 1, :n_bits]
