"""Decode-loop roofline: bytes/iteration accounting + measured GB/s.

Answers the round-1 open question: is the BP decode loop actually at the
platform's HBM bandwidth limit, or is there headroom?  Measures, in ONE
process (the shared chip drifts +-20% between runs, so A/B comparisons
must be interleaved):

1. an HBM streaming ceiling (read+write elementwise pass over a large
   array — the practical bandwidth bound for fused elementwise code),
2. the Pallas check-update kernel alone,
3. the XLA "glue" (routing gather, totals, decision syndrome, bit-node
   update) alone,
4. a full decode iteration (kernel + glue),

each as a scan-chained jitted program whose result is fetched (only a
device->host fetch forces completion on the tunneled TPU).  Bytes per
iteration are computed analytically from tensor shapes and compared to
the measured time for achieved GB/s.

Usage (on the TPU):  python benchmarks/roofline.py [--batch 512] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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


def timed(fn, *args, rounds=3):
    """Median wall time of fn(*args) with a completion-forcing fetch."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # warm-up + compile
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@partial(jax.jit, static_argnames=("reps",))
def _stream_chain(x, reps):
    def body(c, _):
        return c * 1.000001 + 0.5, None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y[0, 0]


@partial(jax.jit, static_argnames=("reps", "opts"))
def _kernel_chain(Lq, mask_i32, syn_sign, reps, opts):
    from qkd_ldpc_tpu.decoder.pallas_kernels import check_update_pallas

    def body(c, _):
        lr = check_update_pallas(
            c, mask_i32, syn_sign, threshold=opts.message_threshold,
            clip=opts.clip_messages, interpret=False,
            algorithm=opts.algorithm, min_sum_alpha=opts.min_sum_alpha,
        )
        return lr, None

    y, _ = jax.lax.scan(body, Lq, None, length=reps)
    return y[0, 0, 0].astype(jnp.float32)


@partial(jax.jit, static_argnames=("reps", "opts"))
def _xla_kernel_chain(Lq, chk_mask, syn_sign, reps, opts):
    from qkd_ldpc_tpu.decoder.bp import (
        _check_update_min_sum,
        _check_update_sum_product,
    )

    thr = jnp.asarray(opts.message_threshold, jnp.float32)

    def body(c, _):
        cf = c.astype(jnp.float32)
        if opts.algorithm == "min-sum":
            lr = _check_update_min_sum(cf, chk_mask, syn_sign, opts.min_sum_alpha)
        else:
            lr = _check_update_sum_product(cf, chk_mask, syn_sign)
        return jnp.clip(lr, -thr, thr).astype(c.dtype), None

    y, _ = jax.lax.scan(body, Lq, None, length=reps)
    return y[0, 0, 0].astype(jnp.float32)


@partial(jax.jit, static_argnames=("reps",))
def _glue_chain(code_dev, Lr0, llr, reps):
    """Everything in a decode iteration EXCEPT the check update: route
    check->bit messages to variable-major, totals + decision, decision
    syndrome, gather totals check-major, bit-node update."""
    from qkd_ldpc_tpu.decoder.bp import _route

    code, M, dc, N, dv = (
        code_dev, code_dev.n_checks, code_dev.dc_max,
        code_dev.n_vars, code_dev.dv_max,
    )
    chk_adj = jnp.asarray(code.chk_adj)
    chk_mask = jnp.asarray(code.chk_mask)
    var_slot = jnp.asarray(code.var_slot)
    thr = jnp.asarray(100.0, jnp.float32)

    def body(c, _):
        B = c.shape[2]
        Lr_var = _route(c.reshape(M * dc, B), var_slot, N, dv)
        total = llr + jnp.sum(Lr_var.astype(jnp.float32), axis=1)
        tot_chk = jnp.take(total, chk_adj.reshape(-1), axis=0).reshape(M, dc, B)
        z_chk = jnp.where(chk_mask[:, :, None], (tot_chk <= 0).astype(jnp.int32), 0)
        syn_hat = jnp.sum(z_chk, axis=1) & 1
        Lq_new = jnp.clip(tot_chk - c.astype(jnp.float32), -thr, thr).astype(c.dtype)
        return Lq_new, syn_hat[0, 0]

    y, s = jax.lax.scan(body, Lr0, None, length=reps)
    return y[0, 0, 0].astype(jnp.float32) + s.sum().astype(jnp.float32)


def _full_iteration_chain(code_dev, llr, syn, opts, n_iters):
    """Full decode at a fixed iteration count (syndrome chosen undecodable
    so the while_loop runs to max_iterations = n_iters)."""
    import dataclasses

    from qkd_ldpc_tpu.decoder.bp import _bp_decode_jit

    o = dataclasses.replace(opts, max_iterations=n_iters)
    z, iters, ok = _bp_decode_jit(code_dev, llr, syn, o)
    return iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--alg", default="sum-product")
    args = ap.parse_args()

    from qkd_ldpc_tpu.decoder.bp import DecodeOptions
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    code = _load_flagship().to_device()
    B, reps = args.batch, args.reps
    M, dc, N, dv = code.n_checks, code.dc_max, code.n_vars, code.dv_max
    E = code.n_edges
    mdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    msz = 2 if args.dtype == "bfloat16" else 4
    opts = DecodeOptions(
        max_iterations=100, message_dtype=args.dtype, backend="pallas",
        algorithm=args.alg,
    )

    dev = jax.devices()[0]
    print(f"device: {dev}  code: {code}  B={B} dtype={args.dtype} "
          f"alg={args.alg} reps={reps}", file=sys.stderr)

    rng = np.random.default_rng(0)

    # --- 1. streaming ceiling -------------------------------------------
    stream_mb = 256
    x = jnp.asarray(rng.normal(size=(stream_mb * 1024 * 1024 // 4,)), jnp.float32)
    x = x.reshape(-1, 8192)
    t = timed(_stream_chain, x, reps)
    stream_bytes = 2 * x.size * 4 * reps
    bw_ceiling = stream_bytes / t / 1e9
    print(f"[1] stream ceiling: {t*1e3/reps:.3f} ms/pass "
          f"({bw_ceiling:.0f} GB/s read+write)")

    # --- 2. Pallas check kernel -----------------------------------------
    Lq = jnp.asarray(rng.normal(0, 4, size=(M, dc, B)), jnp.float32).astype(mdt)
    mask_i32 = jnp.asarray(code.chk_mask).astype(jnp.int32)
    syn_sign = jnp.where(
        jnp.asarray(rng.integers(0, 2, (M, B))) == 1, -1.0, 1.0
    ).astype(jnp.float32)
    t_k = timed(_kernel_chain, Lq, mask_i32, syn_sign, reps, opts)
    kernel_bytes = (2 * M * dc * B * msz + M * dc * 4 + M * B * 4)  # Lq r + Lr w + mask + syn
    print(f"[2] pallas check kernel: {t_k*1e3/reps:.3f} ms/iter "
          f"({kernel_bytes*reps/t_k/1e9:.0f} GB/s achieved, "
          f"ideal bytes {kernel_bytes/1e6:.1f} MB/iter)")

    # --- 2b. XLA check kernel (for comparison) --------------------------
    chk_mask = jnp.asarray(code.chk_mask)
    t_x = timed(_xla_kernel_chain, Lq, chk_mask, syn_sign, reps, opts)
    print(f"[2b] xla check kernel: {t_x*1e3/reps:.3f} ms/iter "
          f"({kernel_bytes*reps/t_x/1e9:.0f} GB/s achieved)")

    # --- 3. XLA glue ------------------------------------------------------
    llr = jnp.asarray(rng.normal(2, 1, size=(N, B)), jnp.float32)
    t_g = timed(_glue_chain, code, Lq, llr, reps)
    # Ideal traffic: read Lr (route gather) + write total + read total
    # (tot_chk gather) + read Lr (bit update) + write Lq_new.  Lr_var and
    # tot_chk are fusion-internal if XLA fuses gathers into consumers.
    glue_bytes_fused = (E * B * msz            # Lr read (route gather src)
                        + N * B * 4            # total write
                        + N * B * 4            # total read (gather src)
                        + E * B * msz          # Lr read (bit update)
                        + E * B * msz          # Lq_new write
                        + N * B * 4)           # llr read
    glue_bytes_unfused = glue_bytes_fused + 2 * E * B * 4 * 2  # +Lr_var, tot_chk materialized r+w
    print(f"[3] xla glue (route+totals+syndrome+bit-update): "
          f"{t_g*1e3/reps:.3f} ms/iter "
          f"(fused-ideal {glue_bytes_fused/1e6:.1f} MB -> "
          f"{glue_bytes_fused*reps/t_g/1e9:.0f} GB/s; "
          f"unfused {glue_bytes_unfused/1e6:.1f} MB -> "
          f"{glue_bytes_unfused*reps/t_g/1e9:.0f} GB/s)")

    # --- 4. full decode iteration ----------------------------------------
    # Random syndrome at high weight: essentially undecodable, so the
    # while_loop runs all n_iters iterations on every frame.
    syn = jnp.asarray(rng.integers(0, 2, size=(M, B)), jnp.int8)
    llr_t = jnp.asarray(rng.normal(2, 1, size=(N, B)), jnp.float32)
    n_it = reps

    def full():
        return _full_iteration_chain(code, llr_t, syn, opts, n_it)

    it = full()
    assert int(np.asarray(it).min()) == n_it, "expected no convergence"
    t_f = timed(lambda: full())
    total_bytes = kernel_bytes + glue_bytes_fused
    print(f"[4] full decode iteration: {t_f*1e3/n_it:.3f} ms/iter "
          f"(kernel+glue parts sum {1e3*(t_k+t_g)/reps:.3f} ms; "
          f"fused-ideal {total_bytes/1e6:.1f} MB/iter -> "
          f"{total_bytes*n_it/t_f/1e9:.0f} GB/s achieved, "
          f"{100*total_bytes*n_it/t_f/1e9/bw_ceiling:.0f}% of stream ceiling)")

    per_frame_iter = t_f / n_it / B
    print(f"    = {per_frame_iter*1e6:.2f} us/frame-iter; "
          f"edge-iters/s = {E*B*n_it/t_f/1e9:.2f} G")


if __name__ == "__main__":
    main()
