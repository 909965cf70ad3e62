"""FROZEN MEASUREMENT RECORD (round-2 exploration, step 2).

The [dc, M, B] layout + fused (tot_chk, Lr) loop measured here was
promoted into decoder/pallas_kernels.py + decoder/bp.py; keep this file
as the provenance of those numbers (self-contained, still runnable).

Round 2 of kernel experiments: layout and blocking.

kernel_lab.py showed the check update is neither HBM- nor
transcendental-bound: min-sum (zero transcendentals) runs only 8% faster
than sum-product.  Hypothesis: the [M, dc=6, B] layout places dc on the
sublane axis (native tile is (8, 128)), wasting 2/8 sublanes of every
vector register and making the dc-axis reductions cross-sublane ops.

This lab measures a [dc, M, B] structure-of-arrays layout — every
elementwise op and the leave-one-out prefix/suffix become clean 2-D
[Mt, Bt] tiles, and the dc reduction is dc-1 elementwise adds — plus
block-size and batch-size scans, and a full-iteration prototype with
all message tensors and routing maps in the new layout.

Usage (on the TPU): python benchmarks/kernel_lab2.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ALIST = (
    "/root/reference/alist_sparse_matrices/"
    "(N=10240,M=5231,R=0.49,CW=3,SEED=666).txt"
)


def _load_flagship():
    from qkd_ldpc_tpu.codes import make_code, read_alist

    if os.path.exists(REFERENCE_ALIST):
        return read_alist(REFERENCE_ALIST)
    return make_code(n=10240, m=5231, dv=3, seed=666, name="flagship-n10240")


def timed(fn, rounds=5):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# --------------------------------------------------------------------------
# [dc, M, B] fused kernel: (tot_chk, Lr_prev) -> Lr_new, product form


def _kernel_dc_first(tot_ref, lrp_ref, mask_ref, syn_ref, lr_ref,
                     *, threshold, clip, dc):
    """All ops are 2-D [Mt, Bt] tiles; dc is a static leading axis."""
    syn = syn_ref[:]
    t = []
    for j in range(dc):
        lq = tot_ref[j].astype(jnp.float32) - lrp_ref[j].astype(jnp.float32)
        if clip:
            lq = jnp.clip(lq, -threshold, threshold)
        mj = mask_ref[j][:, None] != 0
        t.append(jnp.where(mj, jnp.tanh(lq * 0.5), 1.0))

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

    for j in range(dc):
        x = pre[j] * suf[j] * syn
        lr = jnp.log1p(2.0 * x / (1.0 - x))
        if clip:
            lr = jnp.clip(lr, -threshold, threshold)
        lr_ref[j] = lr.astype(lr_ref.dtype)


@partial(jax.jit, static_argnames=("threshold", "clip", "block_m", "block_b"))
def fused_update_dc_first(tot_chk, Lr_prev, mask_i32, syn_sign,
                          threshold=100.0, clip=True, block_m=512, block_b=256):
    dc, M, B = Lr_prev.shape
    bm, bb = min(block_m, M), min(block_b, B)
    return pl.pallas_call(
        partial(_kernel_dc_first, threshold=threshold, clip=clip, dc=dc),
        out_shape=jax.ShapeDtypeStruct((dc, M, B), Lr_prev.dtype),
        grid=(pl.cdiv(M, bm), pl.cdiv(B, bb)),
        in_specs=[
            pl.BlockSpec((dc, bm, bb), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, bm, bb), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dc, bm, bb), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
    )(tot_chk, Lr_prev, mask_i32, syn_sign)


# Standalone check update in [dc, M, B] (Lq input) for kernel-only timing.
def _check_kernel_dc_first(lq_ref, mask_ref, syn_ref, lr_ref, *, threshold, clip, dc):
    syn = syn_ref[:]
    t = []
    for j in range(dc):
        lq = lq_ref[j].astype(jnp.float32)
        mj = mask_ref[j][:, None] != 0
        t.append(jnp.where(mj, jnp.tanh(lq * 0.5), 1.0))
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
    for j in range(dc):
        x = pre[j] * suf[j] * syn
        lr = jnp.log1p(2.0 * x / (1.0 - x))
        if clip:
            lr = jnp.clip(lr, -threshold, threshold)
        lr_ref[j] = lr.astype(lr_ref.dtype)


@partial(jax.jit, static_argnames=("threshold", "clip", "block_m", "block_b"))
def check_update_dc_first(Lq, mask_i32, syn_sign, threshold=100.0, clip=True,
                          block_m=512, block_b=256):
    dc, M, B = Lq.shape
    bm, bb = min(block_m, M), min(block_b, B)
    return pl.pallas_call(
        partial(_check_kernel_dc_first, threshold=threshold, clip=clip, dc=dc),
        out_shape=jax.ShapeDtypeStruct((dc, M, B), Lq.dtype),
        grid=(pl.cdiv(M, bm), pl.cdiv(B, bb)),
        in_specs=[
            pl.BlockSpec((dc, bm, bb), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dc, bm, bb), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
    )(Lq, mask_i32, syn_sign)


# --------------------------------------------------------------------------
# Full-iteration prototype, everything [dc/dv, ., B]


@partial(jax.jit, static_argnames=("reps", "bm", "bb"))
def loop_dc_first(chk_adj_T, var_slot_T, mask_T, llr, syn_sign, Lr0, tot0,
                  reps, bm, bb):
    """(tot_chk, Lr) carry, [dc, M, B] layout, bf16 totals gather.

    chk_adj_T: [dc, M] int32; var_slot_T: [dv, N] int32 flat indices into
    the [dc*M] check-major flat layout (sentinel dc*M); mask_T: [dc, M].
    """
    dc, M = chk_adj_T.shape
    dv, N = var_slot_T.shape
    B = llr.shape[1]

    def body(carry, _):
        tot_chk, Lr = carry
        Lr_new = fused_update_dc_first(tot_chk, Lr, mask_T, syn_sign,
                                       block_m=bm, block_b=bb)
        flat = jnp.concatenate(
            [Lr_new.reshape(dc * M, B), jnp.zeros((1, B), Lr_new.dtype)], axis=0
        )
        Lr_var = jnp.take(flat, var_slot_T.reshape(-1), axis=0).reshape(dv, N, B)
        total = llr + jnp.sum(Lr_var.astype(jnp.float32), axis=0)
        tot_bf = total.astype(jnp.bfloat16)
        tot_chk_new = jnp.take(
            tot_bf, chk_adj_T.reshape(-1), axis=0
        ).reshape(dc, M, B)
        z_chk = jnp.where(mask_T[:, :, None] != 0,
                          (tot_chk_new.astype(jnp.float32) <= 0).astype(jnp.int32), 0)
        syn_hat = jnp.sum(z_chk, axis=0) & 1
        return (tot_chk_new, Lr_new), syn_hat[0, 0]

    (tot, lr), s = jax.lax.scan(body, (tot0, Lr0), None, length=reps)
    return lr[0, 0, 0].astype(jnp.float32) + s.sum().astype(jnp.float32)


def main():
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    code = _load_flagship().to_device()
    M, dc, N, dv = code.n_checks, code.dc_max, code.n_vars, code.dv_max
    mdt = jnp.bfloat16
    reps = 40
    rng = np.random.default_rng(0)

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    # New-layout static tensors.
    chk_adj_T = jnp.asarray(np.asarray(code.chk_adj).T.copy())  # [dc, M]
    mask_T = jnp.asarray(np.asarray(code.chk_mask).T.astype(np.int32).copy())
    vs = np.asarray(code.var_slot)  # [N, dv] flat c*dc + j (sentinel M*dc)
    sent = vs == M * dc
    vs_new = (vs % dc) * M + np.minimum(vs // dc, M - 1)  # j*M + c
    vs_new[sent] = dc * M
    var_slot_T = jnp.asarray(vs_new.T.copy())  # [dv, N]

    for B in (512, 1024):
        Lq_T = jnp.asarray(rng.normal(0, 4, (dc, M, B)), jnp.float32).astype(mdt)
        syn_sign = jnp.where(jnp.asarray(rng.integers(0, 2, (M, B))) == 1,
                             -1.0, 1.0).astype(jnp.float32)
        llr = jnp.asarray(rng.normal(2, 1, (N, B)), jnp.float32)

        @partial(jax.jit, static_argnames=("reps", "bm", "bb"))
        def kchain(Lq, mask, syn, reps, bm, bb):
            def body(c, _):
                return check_update_dc_first(c, mask, syn, block_m=bm, block_b=bb), None
            y, _ = jax.lax.scan(body, Lq, None, length=reps)
            return y[0, 0, 0].astype(jnp.float32)

        for bm, bb in ((256, 128), (512, 256), (1024, 256), (M, 128), (M, 256)):
            if bb > B:
                continue
            try:
                t = timed(lambda: kchain(Lq_T, mask_T, syn_sign, reps, bm, bb))
                print(f"[A2] B={B} check dc-first bm={bm} bb={bb}: "
                      f"{t*1e3/reps:.3f} ms/iter")
            except Exception as e:
                print(f"[A2] B={B} bm={bm} bb={bb}: FAILED {type(e).__name__}")

        # Full loop prototype.
        Lr0 = jnp.zeros((dc, M, B), mdt)
        tot0 = jnp.take(
            llr.astype(mdt), chk_adj_T.reshape(-1), axis=0
        ).reshape(dc, M, B)
        for bm, bb in ((512, 256), (M, 256)):
            if bb > B:
                continue
            try:
                t = timed(lambda: loop_dc_first(chk_adj_T, var_slot_T, mask_T,
                                                llr, syn_sign, Lr0, tot0,
                                                reps, bm, bb))
                print(f"[B2] B={B} full loop dc-first bm={bm} bb={bb}: "
                      f"{t*1e3/reps:.3f} ms/iter ({t*1e3/reps/B*512:.3f} "
                      f"ms/iter normalized to B=512)")
            except Exception as e:
                print(f"[B2] B={B} loop bm={bm} bb={bb}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
