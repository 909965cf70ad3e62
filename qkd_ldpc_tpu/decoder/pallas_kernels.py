"""Pallas TPU kernels for the BP edge sweep (SURVEY.md §7 step 4).

The hot op of the decode loop is the check-node update: a fused
tanh → log-magnitude/sign → row-reduce → leave-one-out → 2·atanh → clip
chain over the check-major message tensor ``Lq[M, dc_max, B]`` (the
TPU-native replacement for the reference's per-edge scalar loop,
``src/qkd_ldpc_algorithm.cpp:48-77``).  This module provides it as a single
hand-written Pallas kernel: one VMEM-resident pass per (check-tile, batch-
tile) grid step — read the tile once from HBM, write the result once.

Honest benchmark note (see ``benchmarks/pallas_vs_xla.md``): XLA already
fuses this chain well, so the Pallas kernel is offered as
``DecodeOptions(backend="pallas")`` with the measured default chosen in
``decoder.bp``.  The kernel is still the right substrate for future fusion
work (e.g. folding the clip + bf16 round-trip, or double-buffered routing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30


def _check_update_kernel(lq_ref, mask_ref, syn_ref, lr_ref, *, threshold, clip):
    """One (check-tile, batch-tile) block of the sum-product check update.

    lq_ref:   [Mt, dc, Bt] messages (storage dtype; compute is f32)
    mask_ref: [Mt, dc]     int32 validity of padded edge slots (int32:
                           Mosaic only supports minor-dim insertion on
                           32-bit types)
    syn_ref:  [Mt, Bt]     f32 syndrome signs (+1 / -1)
    lr_ref:   [Mt, dc, Bt] output check->bit messages
    """
    lq = lq_ref[:].astype(jnp.float32)
    # Expand the int32 mask BEFORE comparing: Mosaic only supports
    # minor-dim insertion on 32-bit types, and `!= 0` yields a bool.
    m = mask_ref[:][:, :, None] != 0

    t = jnp.tanh(lq * 0.5)
    t = jnp.where(m, t, 1.0)
    mag = jnp.maximum(jnp.abs(t), _TINY)
    logmag = jnp.log(mag)
    # Int32 select (Mosaic rejects bool-producing select_n).
    neg = jnp.where(m & (t < 0.0), jnp.int32(1), jnp.int32(0))

    row_log = jnp.sum(logmag, axis=1, keepdims=True)  # [Mt, 1, Bt]
    neg_row = jnp.sum(neg, axis=1, keepdims=True)

    loo_neg = (neg_row - neg) & 1
    sign = jnp.where(loo_neg == 1, -1.0, 1.0) * syn_ref[:][:, None, :]

    # Same algebra as decoder.bp._check_update_sum_product: one exp per
    # check row, leave-one-out by division, capped at 1 (q == 1 -> +inf
    # -> clipped), single-log1p back-transform.
    q = jnp.minimum(jnp.exp(row_log) / mag, 1.0)
    lr = sign * jnp.log1p(2.0 * q / (1.0 - q))
    if clip:
        lr = jnp.clip(lr, -threshold, threshold)
    lr_ref[:] = lr.astype(lr_ref.dtype)


def _check_update_min_sum_kernel(
    lq_ref, mask_ref, syn_ref, lr_ref, *, threshold, clip, alpha
):
    """Normalized min-sum check update, one (check-tile, batch-tile) block.

    Leave-one-out min via top-2 minima; the first occurrence of the
    minimum (lowest slot index) is excluded from its own message exactly
    like the XLA lowering's cumsum trick, so ties behave identically.
    """
    lq = lq_ref[:].astype(jnp.float32)
    m = mask_ref[:][:, :, None] != 0
    Mt, dc, Bt = lq.shape

    absL = jnp.where(m, jnp.abs(lq), jnp.inf)
    neg = jnp.where(m & (lq < 0.0), jnp.int32(1), jnp.int32(0))

    min1 = jnp.min(absL, axis=1, keepdims=True)  # [Mt, 1, Bt]
    slot = jax.lax.broadcasted_iota(jnp.int32, (Mt, dc, Bt), 1)
    # First occurrence of the minimum: the smallest slot index achieving it.
    min_slot = jnp.min(
        jnp.where(absL == min1, slot, jnp.int32(dc)), axis=1, keepdims=True
    )
    first_min1 = slot == min_slot
    min2 = jnp.min(jnp.where(first_min1, jnp.inf, absL), axis=1, keepdims=True)
    loo_min = jnp.where(first_min1, min2, min1)

    neg_row = jnp.sum(neg, axis=1, keepdims=True)
    loo_neg = (neg_row - neg) & 1
    sign = jnp.where(loo_neg == 1, -1.0, 1.0) * syn_ref[:][:, None, :]
    lr = alpha * sign * loo_min
    if clip:
        lr = jnp.clip(lr, -threshold, threshold)
    lr_ref[:] = lr.astype(lr_ref.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "threshold", "clip", "block_m", "block_b", "interpret",
        "algorithm", "min_sum_alpha",
    ),
)
def check_update_pallas(
    Lq: jax.Array,  # [M, dc, B] messages, check-major, batch last
    chk_mask_i32: jax.Array,  # [M, dc] int32
    syn_sign: jax.Array,  # [M, B] f32 in {+1, -1}
    threshold: float = 100.0,
    clip: bool = True,
    block_m: int = 256,
    block_b: int = 128,
    interpret: bool = False,
    algorithm: str = "sum-product",
    min_sum_alpha: float = 0.8,
) -> jax.Array:
    """Fused check-node update as a Pallas TPU kernel.

    Grid tiles over checks and batch; each step streams one
    [block_m, dc, block_b] tile HBM->VMEM, computes the full chain on the
    VPU, and streams the result back — exactly one read and one write of
    the message tensor per iteration.  ``algorithm`` selects the exact
    sum-product rule or normalized min-sum.
    """
    M, dc, B = Lq.shape
    bm = min(block_m, M)
    bb = min(block_b, B)
    grid = (pl.cdiv(M, bm), pl.cdiv(B, bb))

    if algorithm == "min-sum":
        kernel = partial(
            _check_update_min_sum_kernel,
            threshold=threshold, clip=clip, alpha=min_sum_alpha,
        )
    else:
        kernel = partial(_check_update_kernel, threshold=threshold, clip=clip)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, dc, B), Lq.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, dc, bb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, dc), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, dc, bb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Lq, chk_mask_i32, syn_sign)
