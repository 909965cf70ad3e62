"""Decode-loop roofline: bytes/iteration accounting + measured GB/s.

Measures, in ONE process (the shared chip drifts +-20% between runs, so
A/B comparisons must be interleaved):

1. an HBM streaming ceiling (read+write elementwise pass over a large
   array — the practical bandwidth bound for fused elementwise code),
2. the fused Pallas kernel alone (bit-node update + check update,
   [dc, M, B] layout),
3. the XLA "glue" (routing gather, totals, decision syndrome, totals
   gather) alone,
4. a full decode iteration (kernel + glue),

each as a scan-chained jitted program whose result is fetched (only a
device->host fetch forces completion on the tunneled TPU).  Bytes per
iteration are computed analytically from tensor shapes and compared to
the measured time for achieved GB/s.  Findings are written up in
benchmarks/roofline.md; the round-1 -> round-2 design exploration lives
in benchmarks/kernel_lab.py / kernel_lab2.py (frozen records).

Usage (on the TPU):  python benchmarks/roofline.py [--batch 512|1024]
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


_NULL_RT = [0.0]  # measured dispatch+fetch round-trip, subtracted from timings


@jax.jit
def _null(x):
    return x + 1.0


def measure_null_roundtrip():
    """One jitted-dispatch + scalar-fetch round-trip (~25-30 ms over the
    TPU tunnel).  Subtracted from every chain measurement — without this,
    a 40-rep chain reads ~0.7 ms/iter too high (the round-1 roofline made
    exactly that mistake; its per-iteration numbers carry the bias)."""
    x = jnp.asarray(1.0)
    np.asarray(_null(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(_null(x))
        ts.append(time.perf_counter() - t0)
    _NULL_RT[0] = float(np.median(ts))
    return _NULL_RT[0]


def timed(fn, rounds=5):
    """Median wall time of fn() with a completion-forcing fetch, minus the
    null round-trip."""
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])  # warm-up + compile
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - _NULL_RT[0], 1e-9)


@partial(jax.jit, static_argnames=("reps",))
def _stream_chain(x, reps):
    def body(c, _):
        return c * 1.000001 + 0.5, None

    y, _ = jax.lax.scan(body, x, None, length=reps)
    return y[0, 0]


@partial(jax.jit, static_argnames=("reps", "opts"))
def _kernel_chain(tot0, Lr0, mask_T, syn_sign, reps, opts):
    from qkd_ldpc_tpu.decoder.pallas_kernels import fused_update_pallas

    def body(carry, _):
        tot, lr = carry
        lr_new = fused_update_pallas(
            tot, lr, mask_T, syn_sign, threshold=opts.message_threshold,
            clip=opts.clip_messages, interpret=False,
            algorithm=opts.algorithm, min_sum_alpha=opts.min_sum_alpha,
        )
        return (tot, lr_new), None

    (_, y), _ = jax.lax.scan(body, (tot0, Lr0), None, length=reps)
    return y[0, 0, 0].astype(jnp.float32)


def _transposed_maps(code):
    M, dc = code.n_checks, code.dc_max
    chk_adj_T = jnp.asarray(np.asarray(code.chk_adj).T.copy())
    mask_T = jnp.asarray(np.asarray(code.chk_mask).T.copy())
    vs = np.asarray(code.var_slot)
    vmask = np.asarray(code.var_mask)
    vs_new = np.where(vmask, (vs % dc) * M + np.minimum(vs // dc, M - 1), M * dc)
    var_slot_T = jnp.asarray(vs_new.T.copy())
    return chk_adj_T, mask_T, var_slot_T


@partial(jax.jit, static_argnames=("reps",))
def _glue_chain(chk_adj_T, var_slot_T, mask_T, Lr0, llr, reps):
    """Everything in a decode iteration EXCEPT the kernel: route to
    variable-major, totals + decision, totals gather, decision syndrome."""
    dc, M = chk_adj_T.shape
    dv, N = var_slot_T.shape
    B = llr.shape[1]
    mdt = Lr0.dtype

    def body(c, _):
        flat = jnp.concatenate([c.reshape(dc * M, B), jnp.zeros((1, B), c.dtype)], 0)
        Lr_var = jnp.take(flat, var_slot_T.reshape(-1), axis=0).reshape(dv, N, B)
        total = (llr + jnp.sum(Lr_var.astype(jnp.float32), axis=0)).astype(mdt)
        tot_chk = jnp.take(total, chk_adj_T.reshape(-1), axis=0).reshape(dc, M, B)
        z_chk = jnp.where(mask_T[:, :, None],
                          (tot_chk.astype(jnp.float32) <= 0).astype(jnp.int32), 0)
        syn_hat = jnp.sum(z_chk, axis=0) & 1
        # feed tot_chk back as the next "Lr" to serialize iterations
        return tot_chk, syn_hat[0, 0]

    y, s = jax.lax.scan(body, Lr0, None, length=reps)
    return y[0, 0, 0].astype(jnp.float32) + s.sum().astype(jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=150)
    ap.add_argument("--alg", default="sum-product")
    args = ap.parse_args()

    import dataclasses

    from qkd_ldpc_tpu.decoder.bp import DecodeOptions, _bp_decode_jit
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

    print(f"device: {jax.devices()[0]}  code: {code}  B={B} dtype={args.dtype} "
          f"alg={args.alg} reps={reps}", file=sys.stderr)

    rng = np.random.default_rng(0)
    chk_adj_T, mask_T, var_slot_T = _transposed_maps(code)

    rt = measure_null_roundtrip()
    print(f"[0] null dispatch+fetch round-trip: {rt*1e3:.1f} ms "
          f"(subtracted from all chain timings)")

    # --- 1. streaming ceiling -------------------------------------------
    x = jnp.asarray(rng.normal(size=(256 * 1024 * 1024 // 4,)), jnp.float32)
    x = x.reshape(-1, 8192)
    t = timed(lambda: _stream_chain(x, reps))
    bw_ceiling = 2 * x.size * 4 * reps / t / 1e9
    print(f"[1] stream ceiling: {t*1e3/reps:.3f} ms/pass "
          f"({bw_ceiling:.0f} GB/s read+write)")

    # --- 2. fused Pallas kernel -----------------------------------------
    tot0 = jnp.asarray(rng.normal(0, 4, (dc, M, B)), jnp.float32).astype(mdt)
    Lr0 = jnp.asarray(rng.normal(0, 2, (dc, M, B)), jnp.float32).astype(mdt)
    syn_sign = jnp.where(jnp.asarray(rng.integers(0, 2, (M, B))) == 1,
                         -1.0, 1.0).astype(jnp.float32)
    mask_i32 = mask_T.astype(jnp.int32)
    t_k = timed(lambda: _kernel_chain(tot0, Lr0, mask_i32, syn_sign, reps, opts))
    kernel_bytes = 3 * M * dc * B * msz + M * dc * 4 + M * B * 4
    print(f"[2] fused pallas kernel (bit+check update): {t_k*1e3/reps:.3f} ms/iter "
          f"({kernel_bytes*reps/t_k/1e9:.0f} GB/s achieved, "
          f"ideal bytes {kernel_bytes/1e6:.1f} MB/iter)")

    # --- 3. XLA glue ------------------------------------------------------
    llr = jnp.asarray(rng.normal(2, 1, (N, B)), jnp.float32)
    t_g = timed(lambda: _glue_chain(chk_adj_T, var_slot_T, mask_T, Lr0, llr, reps))
    glue_bytes_fused = (E * B * msz      # Lr read (route gather src)
                        + N * B * msz    # total write
                        + N * B * msz    # total read (gather src)
                        + E * B * msz    # tot_chk write
                        + N * B * 4)     # llr read
    print(f"[3] xla glue (route+totals+syndrome+gather): {t_g*1e3/reps:.3f} ms/iter "
          f"(fused-ideal {glue_bytes_fused/1e6:.1f} MB -> "
          f"{glue_bytes_fused*reps/t_g/1e9:.0f} GB/s)")

    # --- 4. full decode iteration ----------------------------------------
    # Random syndrome at high weight: essentially undecodable, so the
    # while_loop runs all n_iters iterations on every frame.
    syn = jnp.asarray(rng.integers(0, 2, (M, B)), jnp.int8)
    llr_t = jnp.asarray(rng.normal(2, 1, (N, B)), jnp.float32)
    o = dataclasses.replace(opts, max_iterations=reps)

    def full():
        return _bp_decode_jit(code, llr_t, syn, o)[1]

    it = full()
    assert int(np.asarray(it).min()) == reps, "expected no convergence"
    t_f = timed(full)
    total_bytes = kernel_bytes + glue_bytes_fused
    print(f"[4] full decode iteration: {t_f*1e3/reps:.3f} ms/iter "
          f"(kernel+glue parts sum {1e3*(t_k+t_g)/reps:.3f} ms; "
          f"fused-ideal {total_bytes/1e6:.1f} MB/iter -> "
          f"{total_bytes*reps/t_f/1e9:.0f} GB/s achieved, "
          f"{100*total_bytes*reps/t_f/1e9/bw_ceiling:.0f}% of stream ceiling)")
    print(f"    = {t_f/reps/B*1e6:.2f} us/frame-iter; "
          f"edge-iters/s = {E*B*reps/t_f/1e9:.2f} G")


if __name__ == "__main__":
    main()
