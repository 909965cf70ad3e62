"""Layered vs flooding: statistical comparison (backend-agnostic).

The layered schedule is a new trajectory family (decoder/layered.py) —
its validation bar is statistical: equal-or-better FER and a large mean
iteration reduction vs flooding at the same operating points.  This
study runs paired points (same trial PRNG stream — identical
(alice, bob) pairs feed both schedules) on the z=32 QC fixture so the
difference IS the schedule, not sampling.

Runs anywhere (CPU is fine: no timing is measured here; hardware
per-sweep cost lives in benchmarks/layered.py).  Findings fold into
benchmarks/layered.md.

Usage: python benchmarks/layered_stats.py [--trials 4000]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--z", type=int, default=32)
    ap.add_argument("--code", default="fixture", dest="which",
                    help="fixture (z=32 toy, honors --z) | qc-ref (the "
                    "reference-profile N=10240 family) | qc (flagship "
                    "z=512)")
    ap.add_argument("--points", default="",
                    help="comma-separated QBER points (default: the "
                    "paired-study set 0.04..0.08)")
    ap.add_argument("--alg", default="sum-product",
                    choices=("sum-product", "min-sum"),
                    help="check-update rule for BOTH schedules (min-sum "
                    "uses the production alpha/beta defaults)")
    args = ap.parse_args()

    from qkd_ldpc_tpu.channel.keys import master_key
    from qkd_ldpc_tpu.codes import make_qc_code
    from qkd_ldpc_tpu.decoder.bp import DecodeOptions
    from qkd_ldpc_tpu.sim.runner import run_point

    if args.which == "qc-ref":
        code = make_qc_code(z=128, nb=80, mb=41, dv=3, seed=666)
    elif args.which == "qc":
        code = make_qc_code(z=512, nb=20, mb=10, dv=3, seed=666)
    else:
        code = make_qc_code(z=args.z, nb=10, mb=5, dv=3, seed=7)
    print(f"device: {jax.devices()[0]}  {code.name}  "
          f"trials/point={args.trials}", file=sys.stderr)

    fl = DecodeOptions(max_iterations=100, message_dtype="bfloat16",
                       algorithm=args.alg)
    la = dataclasses.replace(fl, schedule="layered")
    print(f"{'QBER':>6} {'FER fl':>9} {'FER la':>9} "
          f"{'it fl':>7} {'it la':>7} {'ratio':>6}")
    points = (
        tuple(float(x) for x in args.points.split(","))
        if args.points else (0.04, 0.05, 0.06, 0.07, 0.075, 0.08)
    )
    for pi, qber in enumerate(points):
        row = {}
        for name, opts in (("fl", fl), ("la", la)):
            key = jax.random.fold_in(master_key(424242, "threefry"), pi)
            p, _ = run_point(code, key, qber, trials=args.trials,
                             batch=args.batch, opts=opts)
            # sum_it is over SP-successful trials only (sim/stats.py), so
            # this is the converged mean — failures pinned at the cap
            # never enter, and the schedule signal stays clean near the
            # waterfall.
            row[name] = (1.0 - p.n_sp / p.n_trials,
                         p.sum_it / max(p.n_sp, 1))
        (f1, m1), (f2, m2) = row["fl"], row["la"]
        print(f"{qber:6.3f} {f1:9.5f} {f2:9.5f} "
              f"{m1:7.3f} {m2:7.3f} {m1 / max(m2, 1e-9):6.2f}")


if __name__ == "__main__":
    main()
