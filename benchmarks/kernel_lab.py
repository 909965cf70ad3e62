"""FROZEN MEASUREMENT RECORD (round-2 exploration, step 1).

Ran against the round-1 [M, dc, B]-layout kernels, which have since been
replaced by the dc-first design this lab motivated (see kernel_lab2.py
and decoder/pallas_kernels.py); it will not run against current HEAD.

Check-update kernel experiments (round-2 perf push).

Roofline (benchmarks/roofline.py) showed the decode loop is NOT at the
HBM limit: the Pallas check kernel is VPU-bound on transcendentals
(~72 GB/s of a 340 GB/s stream ceiling) and the XLA glue materializes
f32 gathers.  This lab measures, interleaved in one process (the shared
chip drifts +-20% between runs):

  A. check-update variants: log-form (round 1), prefix/suffix product
     form (tanh + log1p per edge — drops the per-edge log), min-sum
     (transcendental-free floor);
  B. a fused-iteration prototype: carry (tot_chk, Lr) instead of Lq, so
     the bit-node update + clip happens IN the kernel (no Lq round-trip
     through HBM) and the totals gather moves bf16 instead of f32.

Numerical note: the product form computes the same mathematical quantity
as the log form (leave-one-out product of tanh), differing only in f32
rounding (ulps).  Hard-decision agreement is checked on real decode
trials below.

Usage (on the TPU): python benchmarks/kernel_lab.py
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
# A. check-update kernel: prefix/suffix product form


def _check_update_kernel_prod(lq_ref, mask_ref, syn_ref, lr_ref, *, threshold, clip):
    """Sum-product check update via leave-one-out PRODUCTS (no per-edge log).

    t_j = tanh(Lq_j / 2) (masked slots -> 1).  loo_j = prod_{k != j} t_k
    computed with a static prefix/suffix unroll along the dc axis (exact,
    division-free, zero-safe).  |loo| <= 1 always (products of values
    <= 1 in magnitude round to <= 1), and
    2 atanh(x) = log1p(2x / (1 - x)) handles the sign directly — so the
    sign bookkeeping of the log form disappears too.
    Per-edge transcendentals: tanh + log1p (the log form pays tanh + log
    + log1p).
    """
    lq = lq_ref[:].astype(jnp.float32)
    m = mask_ref[:][:, :, None] != 0
    t = jnp.where(m, jnp.tanh(lq * 0.5), 1.0)

    dc = t.shape[1]
    # prefix[j] = prod t[:, :j, :], suffix[j] = prod t[:, j+1:, :]
    pre = [None] * dc
    suf = [None] * dc
    acc = jnp.ones_like(t[:, 0, :])
    for j in range(dc):
        pre[j] = acc
        acc = acc * t[:, j, :]
    acc = jnp.ones_like(t[:, 0, :])
    for j in range(dc - 1, -1, -1):
        suf[j] = acc
        acc = acc * t[:, j, :]
    loo = jnp.stack([pre[j] * suf[j] for j in range(dc)], axis=1)

    x = loo * syn_ref[:][:, None, :]
    lr = jnp.log1p(2.0 * x / (1.0 - x))
    if clip:
        lr = jnp.clip(lr, -threshold, threshold)
    lr_ref[:] = lr.astype(lr_ref.dtype)


@partial(jax.jit, static_argnames=("threshold", "clip", "block_m", "block_b", "interpret"))
def check_update_prod(Lq, mask_i32, syn_sign, threshold=100.0, clip=True,
                      block_m=256, block_b=128, interpret=False):
    M, dc, B = Lq.shape
    bm, bb = min(block_m, M), min(block_b, B)
    return pl.pallas_call(
        partial(_check_update_kernel_prod, threshold=threshold, clip=clip),
        out_shape=jax.ShapeDtypeStruct((M, dc, B), Lq.dtype),
        grid=(pl.cdiv(M, bm), pl.cdiv(B, bb)),
        in_specs=[
            pl.BlockSpec((bm, dc, bb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, dc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, dc, bb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Lq, mask_i32, syn_sign)


# --------------------------------------------------------------------------
# B. fused-iteration kernel: (tot_chk, Lr) -> Lr_new (bit update in-kernel)


def _fused_kernel_prod(tot_ref, lrp_ref, mask_ref, syn_ref, lr_ref,
                       *, threshold, clip):
    """Bit-node update + clip + check update in ONE pass.

    Lq = clip(tot_chk - Lr_prev) recomputed in-register (identical math
    to materializing Lq: clip is elementwise, so producing it at
    consumption time gives the same value) -> product-form check update.
    """
    tot = tot_ref[:].astype(jnp.float32)
    lrp = lrp_ref[:].astype(jnp.float32)
    m = mask_ref[:][:, :, None] != 0
    lq = tot - lrp
    if clip:
        lq = jnp.clip(lq, -threshold, threshold)
    t = jnp.where(m, jnp.tanh(lq * 0.5), 1.0)

    dc = t.shape[1]
    pre = [None] * dc
    suf = [None] * dc
    acc = jnp.ones_like(t[:, 0, :])
    for j in range(dc):
        pre[j] = acc
        acc = acc * t[:, j, :]
    acc = jnp.ones_like(t[:, 0, :])
    for j in range(dc - 1, -1, -1):
        suf[j] = acc
        acc = acc * t[:, j, :]
    loo = jnp.stack([pre[j] * suf[j] for j in range(dc)], axis=1)

    x = loo * syn_ref[:][:, None, :]
    lr = jnp.log1p(2.0 * x / (1.0 - x))
    if clip:
        lr = jnp.clip(lr, -threshold, threshold)
    lr_ref[:] = lr.astype(lr_ref.dtype)


@partial(jax.jit, static_argnames=("threshold", "clip", "block_m", "block_b", "interpret"))
def fused_update(tot_chk, Lr_prev, mask_i32, syn_sign, threshold=100.0,
                 clip=True, block_m=256, block_b=128, interpret=False):
    M, dc, B = Lr_prev.shape
    bm, bb = min(block_m, M), min(block_b, B)
    return pl.pallas_call(
        partial(_fused_kernel_prod, threshold=threshold, clip=clip),
        out_shape=jax.ShapeDtypeStruct((M, dc, B), Lr_prev.dtype),
        grid=(pl.cdiv(M, bm), pl.cdiv(B, bb)),
        in_specs=[
            pl.BlockSpec((bm, dc, bb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, dc, bb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, dc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bb), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, dc, bb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tot_chk, Lr_prev, mask_i32, syn_sign)


# --------------------------------------------------------------------------
# Chained timings


@partial(jax.jit, static_argnames=("reps", "variant"))
def kernel_chain(Lq, mask_i32, syn_sign, reps, variant):
    from qkd_ldpc_tpu.decoder.pallas_kernels import check_update_pallas

    def body(c, _):
        if variant == "log":
            lr = check_update_pallas(c, mask_i32, syn_sign, threshold=100.0,
                                     clip=True, interpret=False)
        elif variant == "prod":
            lr = check_update_prod(c, mask_i32, syn_sign)
        else:  # min-sum
            lr = check_update_pallas(c, mask_i32, syn_sign, threshold=100.0,
                                     clip=True, interpret=False,
                                     algorithm="min-sum")
        return lr, None

    y, _ = jax.lax.scan(body, Lq, None, length=reps)
    return y[0, 0, 0].astype(jnp.float32)


@partial(jax.jit, static_argnames=("reps", "tot_bf16"))
def fused_loop_chain(code_dev, llr, syn_sign, Lr0, tot0, reps, tot_bf16):
    """Full-iteration prototype with the (tot_chk, Lr) carry."""
    from qkd_ldpc_tpu.decoder.bp import _route

    M, dc = code_dev.n_checks, code_dev.dc_max
    N, dv = code_dev.n_vars, code_dev.dv_max
    chk_adj = jnp.asarray(code_dev.chk_adj)
    mask_i32 = jnp.asarray(code_dev.chk_mask).astype(jnp.int32)
    var_slot = jnp.asarray(code_dev.var_slot)
    tdt = jnp.bfloat16 if tot_bf16 else jnp.float32

    def body(carry, _):
        tot_chk, Lr = carry
        B = Lr.shape[2]
        Lr_new = fused_update(tot_chk, Lr, mask_i32, syn_sign)
        Lr_var = _route(Lr_new.reshape(M * dc, B), var_slot, N, dv)
        total = llr + jnp.sum(Lr_var.astype(jnp.float32), axis=1)
        tot_chk_new = (
            jnp.take(total.astype(tdt), chk_adj.reshape(-1), axis=0)
            .reshape(M, dc, B)
        )
        # decision syndrome from the gathered totals (fused consumer)
        z_chk = jnp.where(mask_i32[:, :, None] != 0,
                          (tot_chk_new.astype(jnp.float32) <= 0).astype(jnp.int32), 0)
        syn_hat = jnp.sum(z_chk, axis=1) & 1
        return (tot_chk_new, Lr_new), syn_hat[0, 0]

    (tot, lr), s = jax.lax.scan(body, (tot0, Lr0), None, length=reps)
    return lr[0, 0, 0].astype(jnp.float32) + s.sum().astype(jnp.float32)


@partial(jax.jit, static_argnames=("reps",))
def current_loop_chain(code_dev, llr, syn_sign, Lq0, reps):
    """Round-1 structure (Lq carry, log kernel, f32 totals gather)."""
    from qkd_ldpc_tpu.decoder.bp import _route
    from qkd_ldpc_tpu.decoder.pallas_kernels import check_update_pallas

    M, dc = code_dev.n_checks, code_dev.dc_max
    N, dv = code_dev.n_vars, code_dev.dv_max
    chk_adj = jnp.asarray(code_dev.chk_adj)
    mask_i32 = jnp.asarray(code_dev.chk_mask).astype(jnp.int32)
    var_slot = jnp.asarray(code_dev.var_slot)

    def body(Lq, _):
        B = Lq.shape[2]
        Lr = check_update_pallas(Lq, mask_i32, syn_sign, threshold=100.0,
                                 clip=True, interpret=False)
        Lr_var = _route(Lr.reshape(M * dc, B), var_slot, N, dv)
        total = llr + jnp.sum(Lr_var.astype(jnp.float32), axis=1)
        tot_chk = jnp.take(total, chk_adj.reshape(-1), axis=0).reshape(M, dc, B)
        z_chk = jnp.where(mask_i32[:, :, None] != 0,
                          (tot_chk <= 0).astype(jnp.int32), 0)
        syn_hat = jnp.sum(z_chk, axis=1) & 1
        Lq_new = jnp.clip(tot_chk - Lr.astype(jnp.float32), -100.0, 100.0).astype(Lq.dtype)
        return Lq_new, syn_hat[0, 0]

    y, s = jax.lax.scan(body, Lq0, None, length=reps)
    return y[0, 0, 0].astype(jnp.float32) + s.sum().astype(jnp.float32)


def main():
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    code = _load_flagship().to_device()
    B, reps = 512, 40
    M, dc, N = code.n_checks, code.dc_max, code.n_vars
    mdt = jnp.bfloat16

    rng = np.random.default_rng(0)
    Lq = jnp.asarray(rng.normal(0, 4, (M, dc, B)), jnp.float32).astype(mdt)
    mask_i32 = jnp.asarray(code.chk_mask).astype(jnp.int32)
    syn_sign = jnp.where(jnp.asarray(rng.integers(0, 2, (M, B))) == 1,
                         -1.0, 1.0).astype(jnp.float32)
    llr = jnp.asarray(rng.normal(2, 1, (N, B)), jnp.float32)

    print(f"device: {jax.devices()[0]}  B={B} reps={reps}", file=sys.stderr)

    # Correctness first: prod-form vs log-form on random messages.
    from qkd_ldpc_tpu.decoder.pallas_kernels import check_update_pallas

    a = np.asarray(check_update_pallas(Lq, mask_i32, syn_sign, threshold=100.0,
                                       clip=True, interpret=False).astype(jnp.float32))
    b = np.asarray(check_update_prod(Lq, mask_i32, syn_sign).astype(jnp.float32))
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-3)
    print(f"prod vs log agreement: max rel diff {rel.max():.2e} "
          f"(bf16 outputs identical: {(a == b).mean()*100:.2f}%)")

    # A. kernel variants (interleaved rounds).
    for name in ("log", "prod", "minsum"):
        t = timed(lambda n=name: kernel_chain(Lq, mask_i32, syn_sign, reps, n))
        print(f"[A] kernel {name:6s}: {t*1e3/reps:.3f} ms/iter")

    # B. full-iteration prototypes.
    Lr0 = jnp.zeros((M, dc, B), mdt)
    tot0_f = jnp.take(llr, jnp.asarray(code.chk_adj).reshape(-1), axis=0).reshape(M, dc, B)
    t_cur = timed(lambda: current_loop_chain(code, llr, syn_sign, Lq, reps))
    print(f"[B] current loop (Lq carry, log kernel):        {t_cur*1e3/reps:.3f} ms/iter")
    t_f32 = timed(lambda: fused_loop_chain(code, llr, syn_sign, Lr0, tot0_f, reps, False))
    print(f"[B] fused loop (tot f32 carry, prod kernel):    {t_f32*1e3/reps:.3f} ms/iter")
    t_bf = timed(lambda: fused_loop_chain(code, llr, syn_sign, Lr0,
                                          tot0_f.astype(mdt), reps, True))
    print(f"[B] fused loop (tot bf16 carry, prod kernel):   {t_bf*1e3/reps:.3f} ms/iter")
    print(f"speedup fused-bf16 vs current: {t_cur/t_bf:.2f}x")


if __name__ == "__main__":
    main()
