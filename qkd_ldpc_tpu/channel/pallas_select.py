"""Pallas TPU kernel for the channel's exact k-th-smallest threshold.

The exact-weight channel (channel.keys) finds the k-th smallest of each
row of i.i.d. uint32 scores with a 32-pass bitwise prefix search.  As
XLA ops the loop re-streams the [B, N] score tensor from HBM on every
pass (~32 x 21 MB for the flagship shape — ~1 ms, a quarter of the
whole end-to-end trial cost).  This kernel loads each [bb, N] row block
into VMEM ONCE and runs all 32 passes in-register, so the scores cross
HBM exactly once.

Exactness: the same integer algorithm bit-for-bit (uint32 order is
preserved through the sign-flip trick so compares run as int32, which
Mosaic handles natively).  The tie-completion logic stays in XLA
(channel.keys._exact_weight_mask) and consumes this threshold
identically, so flip masks are bit-identical to the XLA path
(tests/test_channel.py::test_pallas_threshold_matches_xla).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SIGN = -0x80000000  # 0x80000000 as an int32 literal (sign-flip bit)


def fits_vmem(n_cols: int) -> bool:
    """True when a score row (padded to lanes) fits the kernel's VMEM
    budget at the minimum 8-row block (~12 bytes/element live)."""
    n_pad = (-n_cols) % 128
    return 8 * (n_cols + n_pad) * 12 <= (12 << 20)


def _kth_kernel(k_ref, scores_ref, out_ref):
    """One [bb, N] block: 32-pass bitwise prefix search, all in VMEM.

    scores arrive as int32 bits of (u32 ^ 0x80000000), so signed order
    == the original unsigned order.
    """
    k = k_ref[0]
    s = scores_ref[...]  # sign-flipped int32: signed order == u32 order
    bb = s.shape[0]

    def step(j, prefix):
        # prefix/test carry the RAW u32 bit pattern (as int32 bits); only
        # the comparison happens in sign-flipped space.
        test = prefix | jax.lax.shift_left(
            jnp.int32(1), jnp.int32(31 - j)
        )
        cnt = jnp.sum(
            (s < (test ^ _SIGN)).astype(jnp.int32), axis=1, keepdims=True
        )
        return jnp.where(cnt >= k, prefix, test)

    prefix = jax.lax.fori_loop(
        0, 32, step, jnp.zeros((bb, 1), jnp.int32)
    )
    out_ref[...] = prefix


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def kth_smallest_pallas(
    scores: jax.Array,  # [B, N] uint32
    k: jax.Array,  # scalar int32 (traced)
    block_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """k-th smallest per row of uint32 scores -> [B, 1] uint32.

    N is padded to a lane multiple with the maximal value (appending
    maximal elements never changes the k-th smallest for k <= N).
    """
    B, N = scores.shape
    n_pad = (-N) % 128
    flipped = (scores ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    if n_pad:
        flipped = jnp.pad(flipped, ((0, 0), (0, n_pad)),
                          constant_values=0x7FFFFFFF)
    Np = N + n_pad
    # VMEM budget: the row block plus ~2 row-sized live temporaries per
    # pass (compare mask + reduce; empirical: Np=262144 at bb=8 OOMed at
    # 23.84 MB = ~12 B/element).  Callers gate on fits_vmem() and fall
    # back to the XLA search for rows too large for even bb=8.
    bb = min(block_b, B, max(8, (14 << 20) // (Np * 12) // 8 * 8))
    out = pl.pallas_call(
        _kth_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        grid=(pl.cdiv(B, bb),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(k, jnp.int32)[None], flipped)
    # The kernel's prefix is already the raw u32 bit pattern.
    return jax.lax.bitcast_convert_type(out, jnp.uint32)
