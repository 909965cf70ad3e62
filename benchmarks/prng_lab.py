"""Determinism-contract v2 (hardware PRNG) evidence lab (round 4).

Three claims to pin on the real chip (channel/pallas_prng.py; findings
fold into benchmarks/prng.md):

1. **Chunk/shard invariance**: under contract v2 every trial's bit
   blocks are a pure function of its own threefry-derived seed, so the
   SAME global trial ids produce bit-identical (alice, bob) regardless
   of how they are chunked into batches.  (This is the property that
   killed the XLA ``rbg`` candidate: vmapped RngBitGenerator draws
   depend on the batch layout.)
2. **Keygen speedup**: trial generation under v1 spends ~1.0 ms per
   512-trial flagship batch on counter-based bit blocks (memory: round
   3); v2 replaces the two big threefry blocks with the TPU hardware
   generator.  Measured here in isolation (generation only, interleaved
   A/B) and end-to-end via bench.py BENCH_PRNG.
3. **Statistical parity**: v1 and v2 are different random streams, so
   per-point stats differ by sampling noise only.  Compared at
   plateau/mid/waterfall QBER points x `--trials` trials on the QC
   flagship: FER and mean-iteration differences must sit within ~3
   binomial/CLT sigma of each other.

Usage (on the TPU): python benchmarks/prng_lab.py [--trials 5000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    from qkd_ldpc_tpu.channel.keys import (
        make_trials_from_ids,
        master_key,
        num_errors_for,
    )
    from qkd_ldpc_tpu.codes import make_qc_code
    from qkd_ldpc_tpu.decoder.bp import DecodeOptions
    from qkd_ldpc_tpu.sim.runner import run_point
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    code = make_qc_code(z=512, nb=20, mb=10, dv=3, seed=666)
    N = code.n_vars
    print(f"device: {jax.devices()[0]}  {code.name}", file=sys.stderr)

    # ---- 1. chunk invariance (v2): [0..63] as 1x64 vs 2x32 vs 4x16.
    pk = jax.random.fold_in(master_key(777, "pallas"), 0)
    ne = jnp.asarray(num_errors_for(N, 0.05), jnp.int32)

    def gen(ids):
        return make_trials_from_ids(pk, N, ids, ne, prng="pallas")

    ids = jnp.arange(64, dtype=jnp.uint32)
    a_full, b_full = (np.asarray(x) for x in gen(ids))
    for n_chunks in (2, 4):
        parts = [gen(c) for c in jnp.split(ids, n_chunks)]
        a_c = np.concatenate([np.asarray(p[0]) for p in parts])
        b_c = np.concatenate([np.asarray(p[1]) for p in parts])
        assert np.array_equal(a_full, a_c) and np.array_equal(b_full, b_c), (
            f"v2 chunk invariance BROKEN at {n_chunks} chunks"
        )
    # and the exact-weight law: every bob differs from alice in ne bits
    assert (np.logical_xor(a_full, b_full).sum(axis=1) == int(ne)).all()
    print("1. v2 chunk invariance: 1x64 == 2x32 == 4x16 bit-identical; "
          f"all frames carry exactly {int(ne)} errors")

    # ---- 2. generation-only microbench (interleaved).
    ids_b = jnp.arange(args.batch, dtype=jnp.uint32)
    legs = {
        "v1 threefry": jax.jit(
            lambda: make_trials_from_ids(pk, N, ids_b, ne, prng="threefry")
        ),
        "v2 pallas": jax.jit(
            lambda: make_trials_from_ids(pk, N, ids_b, ne, prng="pallas")
        ),
    }
    for name, fn in legs.items():
        np.asarray(fn()[0])
    times = {k: [] for k in legs}
    for _ in range(7):
        for name, fn in legs.items():
            t0 = time.perf_counter()
            np.asarray(fn()[0])
            times[name].append(time.perf_counter() - t0)
    t1, t2 = (float(np.median(times[k])) for k in legs)
    print(f"2. trial generation B={args.batch}: v1 {t1*1e3:.2f} ms, "
          f"v2 {t2*1e3:.2f} ms ({t1/t2:.2f}x) [raw wall incl. ~28ms rt]")

    # ---- 3. statistical parity at three operating points.
    opts = DecodeOptions(max_iterations=100, message_dtype="bfloat16")
    print(f"{'QBER':>6} {'FER v1':>9} {'FER v2':>9} {'dFER/sig':>8} "
          f"{'it v1':>6} {'it v2':>6} {'dit/sig':>7}")
    for qber in (0.03, 0.05, 0.065):
        stats = {}
        for prng in ("threefry", "pallas"):
            key = jax.random.fold_in(master_key(777, prng), 3)
            p, _ = run_point(code, key, qber, trials=args.trials,
                             batch=args.batch, opts=opts, prng=prng)
            T = p.n_trials
            fer = 1.0 - p.n_sp / T
            mean_it = p.sum_it / T
            var_it = p.sum_it2 / T - mean_it**2
            stats[prng] = (fer, mean_it, var_it, T)
        (f1, m1, v1, T), (f2, m2, v2_, _) = stats.values()
        sig_f = max(np.sqrt((f1 * (1 - f1) + f2 * (1 - f2)) / T), 1e-12)
        sig_m = max(np.sqrt((v1 + v2_) / T), 1e-12)
        print(f"{qber:6.3f} {f1:9.5f} {f2:9.5f} {abs(f1-f2)/sig_f:8.2f} "
              f"{m1:6.3f} {m2:6.3f} {abs(m1-m2)/sig_m:7.2f}")


if __name__ == "__main__":
    main()
