"""Serving latency/throughput for the Reconciler endpoint.

End-to-end host-to-host reconcile() latency (NumPy in -> NumPy out,
including padding, device transfer, decode, verification, fetch) at
several lane widths.  On THIS setup the ~28 ms tunnel round-trip
dominates small-lane latency, so the round-trip is also measured and a
subtracted column approximates a locally-attached chip.

Usage (on the TPU): python benchmarks/serving.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ALIST = (
    "/root/reference/alist_sparse_matrices/"
    "(N=10240,M=5231,R=0.49,CW=3,SEED=666).txt"
)


def main():
    from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
    from qkd_ldpc_tpu.codes import make_code, read_alist
    from qkd_ldpc_tpu.decoder import DecodeOptions
    from qkd_ldpc_tpu.serve import Reconciler
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    code = (read_alist(REFERENCE_ALIST) if os.path.exists(REFERENCE_ALIST)
            else make_code(n=10240, m=5231, dv=3, seed=666))

    @jax.jit
    def _null(x):
        return x + 1.0

    np.asarray(_null(jnp.asarray(1.0)))
    ts = [0.0] * 7
    for i in range(7):
        t0 = time.perf_counter()
        np.asarray(_null(jnp.asarray(1.0)))
        ts[i] = time.perf_counter() - t0
    rt = float(np.median(ts))
    print(f"device: {jax.devices()[0]}  tunnel round-trip ~{rt*1e3:.1f} ms",
          file=sys.stderr)

    qber = 0.04
    n_err = num_errors_for(code.n_vars, qber)
    alice, bob = make_trial_batch(
        jax.random.PRNGKey(1), code.n_vars, 512, jnp.asarray(n_err, jnp.int32)
    )
    alice, bob = np.asarray(alice), np.asarray(bob)

    from functools import partial

    from qkd_ldpc_tpu.serve import _serve_step

    @partial(jax.jit, static_argnames=("opts",))
    def _device_step(code, bob_d, syn_d, q, opts):
        z, it, ok = _serve_step(code, bob_d, syn_d, q, opts)
        # scalar checksum: forces the full decode without a 5 MB download
        return z.astype(jnp.int32).sum() + it.sum() + ok.sum()

    print(f"{'lanes':>6} {'host-to-host p50':>17} {'device-only p50':>16} "
          f"{'frames/s (dev)':>14}")
    opts = DecodeOptions(message_dtype="bfloat16")
    q = jnp.asarray(n_err / code.n_vars, jnp.float32)
    for lanes in (1, 32, 128, 512):
        rec = Reconciler(code, opts, lanes=lanes).warmup()
        syn = rec.syndromes(alice[:lanes])
        rec.reconcile(bob[:lanes], syn, qber=n_err / code.n_vars)  # warm shape
        lat = []
        for _ in range(9):  # tunnel transfers dominate; more reps exceed practical windows
            t0 = time.perf_counter()
            out = rec.reconcile(bob[:lanes], syn, qber=n_err / code.n_vars)
            lat.append(time.perf_counter() - t0)
        assert out.syndromes_match.all()
        p50 = float(np.median(lat))

        bob_d = jnp.asarray(bob[:lanes])
        syn_d = jnp.asarray(syn)
        np.asarray(_device_step(rec.code, bob_d, syn_d, q, opts))  # warm
        dev = []
        for _ in range(9):  # tunnel transfers dominate; more reps exceed practical windows
            t0 = time.perf_counter()
            np.asarray(_device_step(rec.code, bob_d, syn_d, q, opts))
            dev.append(time.perf_counter() - t0)
        pdev = max(float(np.median(dev)) - rt, 1e-9)
        print(f"{lanes:>6} {p50*1e3:14.2f} ms {pdev*1e3:13.2f} ms "
              f"{lanes/pdev:14.0f}")


if __name__ == "__main__":
    main()
