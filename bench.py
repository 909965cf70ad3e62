"""Headline benchmark: decoded info-bits/s/chip on the N=10240 code.

Reproduces the reference's measured operating point (BASELINE.md): an
N=10240 R~0.49 column-weight-3 code at QBER 0.05, sum-product with
100-iteration cap and LLR clamp 100.0.  The reference decodes
0.0117 s/frame single-core => ~428,000 info-bits/s (K=5009); vs_baseline
is measured against that number.

Round 3: the default code is the quasi-cyclic construction at matched
N/R/profile (z=512, girth >= 6; FER parity vs the random ensemble in
benchmarks/qc_parity.md) decoded with roll routing — the structured
family deployed QKD systems actually use, and 1.43x faster per decode
iteration than the unstructured flagship (benchmarks/qc.md).
``BENCH_CODE=flagship`` restores the round-2 unstructured operating
point (the reference's own shipped matrix when mounted).

The timed region is the full production pipeline per trial batch: key
generation, exact-weight error injection, a-priori LLRs, Alice syndrome,
batched BP decode with early exit, keys-match check, stats reduction.
All ``reps`` batches are chained *sequentially inside one jitted program*
(lax.scan) and the final scalars are fetched to host — this forces real
completion and amortizes dispatch/tunnel latency, which on the remote-TPU
setup is large and makes naive ``block_until_ready`` timing meaningless
(observed: it can return before the device finishes).

Prints ONE JSON line. Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_INFO_BITS_PER_S = 428_000.0  # reference @ QBER 0.05, 1 CPU core
QBER = 0.05
REFERENCE_ALIST = (
    "/root/reference/alist_sparse_matrices/"
    "(N=10240,M=5231,R=0.49,CW=3,SEED=666).txt"
)


def _load_flagship():
    from qkd_ldpc_tpu.codes import make_code, make_qc_code, read_alist

    which = os.environ.get("BENCH_CODE", "qc")
    if which == "qc":
        return make_qc_code(z=512, nb=20, mb=10, dv=3, seed=666)
    if which == "qc-ref":
        # The QC family at the reference's own rate profile (VERDICT r3
        # item 7): N=10240, M=5248, R=0.4875, mixed 5/6 base rows — the
        # closest QC point to the reference alist's R=0.489 histogram.
        return make_qc_code(z=128, nb=80, mb=41, dv=3, seed=666)
    if os.path.exists(REFERENCE_ALIST):
        return read_alist(REFERENCE_ALIST)
    return make_code(n=10240, m=5231, dv=3, seed=666, name="flagship-n10240")


@partial(jax.jit, static_argnames=("batch", "reps", "opts", "prng"))
def _sweep_chunk(code, point_key, n_err, start_offset, batch, reps, opts,
                 prng="threefry"):
    """reps sequential trial batches fused into one device program.

    Returns the stacked [7] int32 stat vector so the result comes home in
    ONE device->host transfer (a dict of 7 scalars costs 7 sequential
    ~25 ms round-trips over the remote-TPU tunnel).
    """
    from qkd_ldpc_tpu.sim.runner import merge_partials_tree, point_batch_partials
    from qkd_ldpc_tpu.sim.stats import stack_partials

    def body(carry, i):
        red = point_batch_partials(
            code, point_key, n_err, start_offset + i * batch,
            jnp.asarray(batch, jnp.int32), batch, opts, prng,
        )
        return merge_partials_tree(carry, red), None

    init = point_batch_partials(
        code, point_key, n_err, start_offset, jnp.asarray(batch, jnp.int32),
        batch, opts, prng,
    )
    out, _ = jax.lax.scan(body, init, jnp.arange(1, reps, dtype=jnp.int32))
    return stack_partials(out)


def main() -> None:
    from qkd_ldpc_tpu.channel.keys import num_errors_for
    from qkd_ldpc_tpu.decoder.bp import DecodeOptions
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # warm-up reuses prior compiles (~3 min saved)

    # Device-resident adjacency: avoid re-uploading the code's host numpy
    # leaves on every chunk call (the remote-TPU link makes that costly).
    code = _load_flagship().to_device()
    opts = DecodeOptions(
        max_iterations=100, clip_messages=True, message_threshold=100.0,
        algorithm=os.environ.get("BENCH_ALG", "sum-product"),
        # bf16 message storage (f32 compute): waterfall FER bias measured
        # below Monte-Carlo resolution at 10^4 paired trials/point
        # (PARITY.md); halves the decode loop's HBM traffic.  "int8" is
        # also accepted (benchmarks/int8.md: slower here, quarter state).
        message_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        # "auto" resolves to the fused dc-first Pallas kernels on TPU
        # (benchmarks/pallas_vs_xla.md: 1.74x end-to-end vs the XLA
        # lowering of the same algorithm).
        backend=os.environ.get("BENCH_BACKEND", "auto"),
    )
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    reps = int(os.environ.get("BENCH_REPS", "24"))
    # Round-4 levers (both default ON — they are the shipping operating
    # point; see benchmarks/prng.md and the compaction notes in
    # decoder/bp.py):
    # - BENCH_PRNG=threefry restores the contract-v1 reference-parity
    #   stream ("pallas" keeps the threefry key-derivation tree and
    #   generates the per-trial bit blocks with the TPU hardware PRNG —
    #   determinism contract v2, channel/pallas_prng.py).
    # - BENCH_COMPACT=0 disables residency compaction (bit-identical
    #   results either way; schedule only).
    prng = os.environ.get("BENCH_PRNG", "pallas")
    compact = int(os.environ.get("BENCH_COMPACT", "8"))
    if compact:
        import dataclasses

        opts = dataclasses.replace(
            opts, compact_after=compact, compact_lanes=batch // 4
        )
    # BENCH_SCHEDULE=layered: serial check-layered sweeps (~1.7x fewer
    # iterations at QBER 0.05, equal-or-better FER — decoder/layered.py,
    # benchmarks/layered.md).  A different trajectory family than the
    # reference's flooding schedule.  Compaction composes (the layered
    # loop has the same phase A/B/C structure); layered converges in
    # ~half the sweeps, so BENCH_COMPACT's point is halved for it.
    schedule = os.environ.get("BENCH_SCHEDULE", "flooding")
    if schedule != "flooding":
        import dataclasses

        opts = dataclasses.replace(
            opts, schedule=schedule,
            compact_after=max(compact // 2, 1) if compact else 0,
        )
    n_err = num_errors_for(code.n_vars, QBER)
    from qkd_ldpc_tpu.channel.keys import master_key

    point_key = jax.random.fold_in(master_key(777, prng), 0)

    dev = jax.devices()[0]
    print(f"device: {dev}, code: {code}, batch={batch}, reps={reps}, "
          f"alg={opts.algorithm}, prng={prng}, compact={compact}",
          file=sys.stderr)

    def chunk(start):
        out = _sweep_chunk(
            code, point_key, jnp.asarray(n_err, jnp.int32),
            jnp.asarray(start, jnp.int32), batch, reps, opts, prng,
        )
        from qkd_ldpc_tpu.sim.stats import STAT_KEYS

        v = np.asarray(out)  # single fetch; forces completion
        return dict(zip(STAT_KEYS, v.tolist()))

    # Unattended degrade ladder: the two Pallas surfaces Mosaic could
    # conceivably reject on a new compiler drop are the hardware-PRNG
    # kernel (contract v2) and, under BENCH_SCHEDULE=layered, the fused
    # layered-sweep kernel (decoder/pallas_layered, round 5).  A bench
    # run must degrade honestly (stderr records what actually ran)
    # rather than fail outright: first drop the layered kernel to the
    # XLA layered loop, then drop the PRNG to the v1 threefry stream.
    r = None
    for attempt in range(3):
        try:
            r = chunk(0)  # warm-up / compile
            break
        except Exception as e:  # pragma: no cover - hardware-dependent
            if (opts.schedule == "layered"
                    and opts.resolve_backend() == "pallas"):
                import dataclasses

                print(f"pallas layered kernel failed ({type(e).__name__}: "
                      f"{e}); falling back to the XLA layered loop",
                      file=sys.stderr)
                opts = dataclasses.replace(opts, backend="xla")
            elif prng == "pallas":
                print(f"pallas PRNG path failed ({type(e).__name__}: {e}); "
                      f"falling back to threefry", file=sys.stderr)
                prng = "threefry"
                point_key = jax.random.fold_in(master_key(777, prng), 0)
            else:
                raise
    if r is None:
        r = chunk(0)
    print(
        f"warmup: SP success {int(r['n_sp'])}/{batch * reps}, "
        f"mean iters {float(r['sum_it']) / max(int(r['n_sp']), 1):.2f}",
        file=sys.stderr,
    )

    rounds = int(os.environ.get("BENCH_ROUNDS", "5"))
    # Steady-state throughput: dispatch ALL chunks up front (XLA queues
    # them back-to-back on device), then fetch in order — the ~30 ms
    # per-dispatch host latency overlaps device compute, as any production
    # sweep would pipeline it.  Reported rate is the mean over the queue.
    t0 = time.perf_counter()
    pending = [
        _sweep_chunk(
            code, point_key, jnp.asarray(n_err, jnp.int32),
            jnp.asarray((k + 1) * batch * reps, jnp.int32), batch, reps,
            opts, prng,
        )
        for k in range(rounds)
    ]
    from qkd_ldpc_tpu.sim.stats import STAT_KEYS

    accs = [dict(zip(STAT_KEYS, np.asarray(p).tolist())) for p in pending]
    dt = (time.perf_counter() - t0) / rounds

    trials = batch * reps
    frames_per_s = trials / dt
    info_bits_per_s = frames_per_s * code.n_info_bits
    n_sp = sum(int(a["n_sp"]) for a in accs)
    mean_it = sum(float(a["sum_it"]) for a in accs) / max(n_sp, 1)
    print(
        f"{trials} trials/chunk x {rounds} pipelined chunks, "
        f"{dt:.3f}s/chunk = {frames_per_s:.1f} frames/s, "
        f"{info_bits_per_s / 1e6:.2f} Minfo-bits/s, "
        f"SP success {n_sp}/{rounds * trials}, mean iters {mean_it:.2f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "decoded_info_bits_per_s_chip_n10240_qber05",
                "value": round(info_bits_per_s, 1),
                "unit": "info-bits/s",
                "vs_baseline": round(info_bits_per_s / BASELINE_INFO_BITS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
