"""Pallas TPU kernels for the BP edge sweep (SURVEY.md §7 step 4).

The hot op of the decode loop is the check-node update — the TPU-native
replacement for the reference's per-edge scalar loop
(``src/qkd_ldpc_algorithm.cpp:48-77``).  Round-2 design, driven by the
measured roofline (benchmarks/roofline.md):

- **dc-first layout** ``[dc_max, M, B]``: the round-1 ``[M, dc, B]``
  layout put dc (=6 for the flagship code) on the sublane axis of the
  native (8, 128) vector tile, wasting 2/8 sublanes of every register and
  making row reductions cross-sublane ops.  With dc as a static leading
  axis every elementwise op is a clean 2-D ``[Mt, Bt]`` tile and the row
  reduction is dc-1 elementwise adds.  Measured: 1.02 -> 0.89 ms/iter for
  the kernel alone, 1.90 -> 1.21 ms for the full decode iteration at
  B=512 (benchmarks/kernel_lab2.py).
- **Leave-one-out by prefix/suffix products** instead of the round-1
  sign/log-magnitude form: t_j = tanh(Lq_j/2); loo_j = prod_{k!=j} t_k
  via a static prefix/suffix unroll — exact, division-free (unlike the
  reference's fragile ``row_prod / tanh_j``, qkd_ldpc_algorithm.cpp:67),
  zero-safe, and |loo| <= 1 always (a product of factors with |t| <= 1
  rounds to <= 1).  The sign rides inside the product, so the sign-parity
  bookkeeping disappears; 2 atanh(x) = log1p(2x/(1-x)) handles signed x
  directly.  Saturation |loo| == 1 -> +/-inf is clipped by the message
  threshold exactly where the reference clips (qkd_ldpc_algorithm.cpp:74-77).
- **Fused bit-node update**: the loop carries (tot_chk, Lr) instead of
  Lq, and this kernel recomputes Lq = clip(tot_chk - Lr) in-register —
  the bit-node update + clip + bf16 round never round-trips through HBM.
  Clip-at-consumption equals clip-at-production (elementwise), so the
  math is identical to materializing Lq.

Both sum-product and normalized min-sum are provided, each as a
first-iteration variant (Lq input — the initial messages are the
*unclipped* a-priori LLRs, reference qkd_ldpc_algorithm.cpp:10-18) and a
fused variant ((tot_chk, Lr_prev) input).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sp_messages(t, syn, threshold, clip):
    """Sum-product outputs from tanh'd inputs: list of [Mt, Bt] tiles."""
    dc = len(t)
    pre = [None] * dc
    suf = [None] * dc
    acc = jnp.ones_like(t[0])
    for j in range(dc):
        pre[j] = acc
        acc = acc * t[j]
    acc = jnp.ones_like(t[0])
    for j in range(dc - 1, -1, -1):
        suf[j] = acc
        acc = acc * t[j]
    out = []
    for j in range(dc):
        x = pre[j] * suf[j] * syn
        lr = jnp.log1p(2.0 * x / (1.0 - x))
        if clip:
            lr = jnp.clip(lr, -threshold, threshold)
        out.append(lr)
    return out


def _ms_messages(lq, masks, syn, threshold, clip, alpha, beta=0.0):
    """Normalized min-sum outputs from raw f32 inputs (list of tiles).

    Tie rule matches the round-1 kernel and the reference-order semantics:
    the excluded edge is the FIRST occurrence (lowest slot j) of the row
    minimum.  Sign parity via an int accumulator.
    """
    dc = len(lq)
    absl = [jnp.where(masks[j], jnp.abs(lq[j]), jnp.inf) for j in range(dc)]
    neg = [
        jnp.where(masks[j] & (lq[j] < 0.0), jnp.int32(1), jnp.int32(0))
        for j in range(dc)
    ]
    m1 = absl[0]
    s1 = jnp.zeros_like(neg[0])
    for j in range(1, dc):
        upd = absl[j] < m1  # strict: keeps the first occurrence
        s1 = jnp.where(upd, jnp.int32(j), s1)
        m1 = jnp.minimum(m1, absl[j])
    m2 = jnp.full_like(m1, jnp.inf)
    for j in range(dc):
        m2 = jnp.minimum(m2, jnp.where(s1 == j, jnp.inf, absl[j]))
    tot_neg = neg[0]
    for j in range(1, dc):
        tot_neg = tot_neg + neg[j]
    out = []
    for j in range(dc):
        loo = jnp.where(s1 == j, m2, m1)
        if beta:
            loo = jnp.maximum(loo - beta, 0.0)
        loo_neg = (tot_neg - neg[j]) & 1
        sign = jnp.where(loo_neg == 1, -1.0, 1.0) * syn
        lr = alpha * sign * loo
        if clip:
            lr = jnp.clip(lr, -threshold, threshold)
        out.append(lr)
    return out


def _load(ref, j, scale):
    """Storage -> f32 (int8 fixed-point dequantizes by `scale`)."""
    x = ref[j].astype(jnp.float32)
    return x * scale if scale is not None else x


def _store(ref, j, x, scale):
    """f32 -> storage (int8 saturating fixed-point when `scale` set)."""
    if scale is not None:
        q = jnp.clip(jnp.round(x * (1.0 / scale)), -127.0, 127.0)
        ref[j] = q.astype(ref.dtype)
    else:
        ref[j] = x.astype(ref.dtype)


def _check_kernel(lq_ref, mask_ref, syn_ref, lr_ref, *, threshold, clip,
                  dc, algorithm, alpha, beta, scale):
    """First-iteration check update: Lq (unclipped a-priori gathers) in."""
    syn = syn_ref[:]
    masks = [mask_ref[j][:, None] != 0 for j in range(dc)]
    lq = [_load(lq_ref, j, scale) for j in range(dc)]
    if algorithm == "min-sum":
        out = _ms_messages(lq, masks, syn, threshold, clip, alpha, beta)
    else:
        t = [jnp.where(masks[j], jnp.tanh(lq[j] * 0.5), 1.0) for j in range(dc)]
        out = _sp_messages(t, syn, threshold, clip)
    for j in range(dc):
        _store(lr_ref, j, out[j], scale)


def _fused_kernel(tot_ref, lrp_ref, mask_ref, syn_ref, lr_ref, *, threshold,
                  clip, dc, algorithm, alpha, beta, scale):
    """Fused bit-node + check update: Lq = clip(tot_chk - Lr_prev) in-register."""
    syn = syn_ref[:]
    masks = [mask_ref[j][:, None] != 0 for j in range(dc)]
    lq = []
    for j in range(dc):
        v = _load(tot_ref, j, scale) - _load(lrp_ref, j, scale)
        if clip:
            v = jnp.clip(v, -threshold, threshold)
        lq.append(v)
    if algorithm == "min-sum":
        out = _ms_messages(lq, masks, syn, threshold, clip, alpha, beta)
    else:
        t = [jnp.where(masks[j], jnp.tanh(lq[j] * 0.5), 1.0) for j in range(dc)]
        out = _sp_messages(t, syn, threshold, clip)
    for j in range(dc):
        _store(lr_ref, j, out[j], scale)


def _specs(dc, bm, bb, n_edge_tensors):
    edge = pl.BlockSpec((dc, bm, bb), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    return (
        [edge] * n_edge_tensors
        + [
            pl.BlockSpec((dc, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        edge,
    )


def _auto_blocks(block_m, dc, bb, itemsize, n_edge_io):
    """Largest (check-tile height, batch-tile width) fitting the ~16 MB
    scoped-VMEM stack.

    Per-element VMEM cost ~= IO buffers (n_edge_io * itemsize, counting
    the output) + ~16 bytes of live f32 temporaries (empirical: a 3-IO
    f32 block of 6x512x250 allocates 18 MB = 23.4 B/elem; a 2-IO f32
    block of 6x448x256 allocates 16.3 MB = 23.7 B/elem).  Keeps a 2 MB
    margin and rounds bm down to a multiple of 128 (the [dc, bm] mask
    block puts bm on the lane axis, which Mosaic requires divisible by
    128).  When even bm=128 would blow the budget (high-dc codes at
    large bb), the batch tile bb is halved until the block fits instead
    of silently flooring bm over budget (a Mosaic scoped-VMEM failure).
    """
    budget = 14 * 1024 * 1024
    per_elem = n_edge_io * itemsize + 16

    def bm_for(bb_):
        return (budget // (dc * bb_ * per_elem) // 128) * 128

    while bm_for(bb) < 128 and bb > 8:
        bb = max(8, bb // 2)
    if bm_for(bb) < 128:
        # Even the minimum 8-lane batch tile cannot fit a 128-row check
        # tile: flooring bm to 128 anyway would exceed scoped VMEM and
        # fail inside Mosaic with an opaque error.  Refuse with the fix.
        raise ValueError(
            f"Pallas check-update block (dc={dc}, itemsize={itemsize}) "
            "exceeds the ~14 MB scoped-VMEM budget even at the minimum "
            "batch tile; use DecodeOptions(backend='xla') for this code"
        )
    bm = min(block_m, bm_for(bb))
    return bm, bb


@partial(jax.jit, static_argnames=("threshold", "clip", "block_m", "block_b",
                                   "interpret", "algorithm", "min_sum_alpha",
                                   "min_sum_beta", "scale"))
def check_update_pallas(
    Lq: jax.Array,  # [dc, M, B] messages, dc-first, batch last
    chk_mask_i32: jax.Array,  # [dc, M] int32
    syn_sign: jax.Array,  # [M, B] f32 in {+1, -1}
    threshold: float = 100.0,
    clip: bool = True,
    block_m: int = 512,
    block_b: int = 256,
    interpret: bool = False,
    algorithm: str = "sum-product",
    min_sum_alpha: float = 0.8,
    min_sum_beta: float = 0.0,
    scale: float | None = None,  # int8 fixed-point LSB (None = float storage)
) -> jax.Array:
    """First-iteration check update as a Pallas TPU kernel ([dc, M, B])."""
    dc, M, B = Lq.shape
    bm, bb = _auto_blocks(block_m, dc, min(block_b, B), Lq.dtype.itemsize, 2)
    bm = min(bm, M)
    kernel = partial(_check_kernel, threshold=threshold, clip=clip, dc=dc,
                     algorithm=algorithm, alpha=min_sum_alpha,
                     beta=min_sum_beta, scale=scale)
    in_specs, out_spec = _specs(dc, bm, bb, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dc, M, B), Lq.dtype),
        grid=(pl.cdiv(M, bm), pl.cdiv(B, bb)),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(Lq, chk_mask_i32, syn_sign)


@partial(jax.jit, static_argnames=("threshold", "clip", "block_m", "block_b",
                                   "interpret", "algorithm", "min_sum_alpha",
                                   "min_sum_beta", "scale"))
def fused_update_pallas(
    tot_chk: jax.Array,  # [dc, M, B] gathered totals (message dtype)
    Lr_prev: jax.Array,  # [dc, M, B] previous check->bit messages
    chk_mask_i32: jax.Array,  # [dc, M] int32
    syn_sign: jax.Array,  # [M, B] f32 in {+1, -1}
    threshold: float = 100.0,
    clip: bool = True,
    block_m: int = 512,
    block_b: int = 256,
    interpret: bool = False,
    algorithm: str = "sum-product",
    min_sum_alpha: float = 0.8,
    min_sum_beta: float = 0.0,
    scale: float | None = None,  # int8 fixed-point LSB (None = float storage)
) -> jax.Array:
    """Fused bit-node update + check update ([dc, M, B] -> [dc, M, B])."""
    dc, M, B = Lr_prev.shape
    bm, bb = _auto_blocks(
        block_m, dc, min(block_b, B), Lr_prev.dtype.itemsize, 3
    )
    bm = min(bm, M)
    kernel = partial(_fused_kernel, threshold=threshold, clip=clip, dc=dc,
                     algorithm=algorithm, alpha=min_sum_alpha,
                     beta=min_sum_beta, scale=scale)
    in_specs, out_spec = _specs(dc, bm, bb, 2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dc, M, B), Lr_prev.dtype),
        grid=(pl.cdiv(M, bm), pl.cdiv(B, bb)),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(tot_chk, Lr_prev, chk_mask_i32, syn_sign)


def _fused_kernel_fresh(tot_ref, lrp_ref, fresh_ref, mask_ref, syn_ref,
                        lr_ref, *, threshold, clip, dc, algorithm, alpha,
                        beta, scale):
    """Fused update with a per-lane 'fresh' flag ([1, Bt] int32): fresh
    lanes skip the clip on the recomputed Lq — their (tot, Lr=0) state
    encodes a FIRST iteration, whose check inputs are the raw (never
    clipped) a-priori LLRs (reference qkd_ldpc_algorithm.cpp:10-18)."""
    syn = syn_ref[:]
    fresh = fresh_ref[:] != 0  # [1, Bt], broadcasts over the check tile
    masks = [mask_ref[j][:, None] != 0 for j in range(dc)]
    lq = []
    for j in range(dc):
        raw = _load(tot_ref, j, scale) - _load(lrp_ref, j, scale)
        if clip:
            v = jnp.where(fresh, raw, jnp.clip(raw, -threshold, threshold))
        else:
            v = raw
        lq.append(v)
    if algorithm == "min-sum":
        out = _ms_messages(lq, masks, syn, threshold, clip, alpha, beta)
    else:
        t = [jnp.where(masks[j], jnp.tanh(lq[j] * 0.5), 1.0) for j in range(dc)]
        out = _sp_messages(t, syn, threshold, clip)
    for j in range(dc):
        _store(lr_ref, j, out[j], scale)


@partial(jax.jit, static_argnames=("threshold", "clip", "block_m", "block_b",
                                   "interpret", "algorithm", "min_sum_alpha",
                                   "min_sum_beta", "scale"))
def fused_update_fresh_pallas(
    tot_chk: jax.Array,  # [dc, M, B]
    Lr_prev: jax.Array,  # [dc, M, B]
    chk_mask_i32: jax.Array,  # [dc, M] int32
    syn_sign: jax.Array,  # [M, B] f32
    fresh_i32: jax.Array,  # [1, B] int32: 1 = lane restarts (iteration 1)
    threshold: float = 100.0,
    clip: bool = True,
    block_m: int = 512,
    block_b: int = 256,
    interpret: bool = False,
    algorithm: str = "sum-product",
    min_sum_alpha: float = 0.8,
    min_sum_beta: float = 0.0,
    scale: float | None = None,  # int8 fixed-point LSB (None = float storage)
) -> jax.Array:
    """Fused update with per-lane restart semantics (continuation runner)."""
    dc, M, B = Lr_prev.shape
    bm, bb = _auto_blocks(
        block_m, dc, min(block_b, B), Lr_prev.dtype.itemsize, 3
    )
    bm = min(bm, M)
    kernel = partial(_fused_kernel_fresh, threshold=threshold, clip=clip,
                     dc=dc, algorithm=algorithm, alpha=min_sum_alpha,
                     beta=min_sum_beta, scale=scale)
    edge = pl.BlockSpec((dc, bm, bb), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dc, M, B), Lr_prev.dtype),
        grid=(pl.cdiv(M, bm), pl.cdiv(B, bb)),
        in_specs=[
            edge, edge,
            pl.BlockSpec((1, bb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=edge,
        interpret=interpret,
    )(tot_chk, Lr_prev, fresh_i32, chk_mask_i32, syn_sign)
