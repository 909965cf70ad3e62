"""QC decode-iteration glue decomposition (round 3 follow-up).

The full roll-routed iteration measures 0.367 ms at B=512; the fused
kernel alone accounts for ~0.125 ms (755 GB/s on 94 MB), leaving
~0.24 ms of XLA "glue" (route-to-var + totals + decision syndrome +
gather-to-check) against a ~0.15 ms fused-ideal.  This harness times
the glue pieces in isolation to find the non-fused passes.

Usage (on the TPU): python benchmarks/qc_glue.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.roofline import measure_null_roundtrip, timed


def main():
    from qkd_ldpc_tpu.codes import make_qc_code
    from qkd_ldpc_tpu.decoder.qc_routing import qc_gather_chk, qc_route_var
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B, reps = 512, 150
    code = make_qc_code(z=512, nb=20, mb=10, dv=3, seed=666)
    qc = code.qc
    N, M, dc, dv = code.n_vars, code.n_checks, code.dc_max, code.dv_max
    mdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    Lr0 = jnp.asarray(rng.normal(0, 2, (dc, M, B)), jnp.float32).astype(mdt)
    llr = jnp.asarray(rng.normal(2, 1, (N, B)), jnp.float32)
    syn = jnp.asarray(rng.integers(0, 2, (M, B)), jnp.int32)
    total0 = jnp.asarray(rng.normal(0, 3, (N, B)), jnp.float32).astype(mdt)

    rt = measure_null_roundtrip()
    print(f"device: {jax.devices()[0]}  {code.name}  B={B} reps={reps} "
          f"null rt {rt*1e3:.1f} ms")

    @partial(jax.jit, static_argnames=("reps",))
    def chain_route_total(Lr, llr, reps):
        def body(c, _):
            Lr_var = qc_route_var(c, qc, dv, B)
            total = (llr + jnp.sum(Lr_var.astype(jnp.float32), axis=0)).astype(mdt)
            # feed back (route expects [dc, M, B]): fake it with a gather
            nxt = qc_gather_chk(total, qc, dc, B)
            return nxt, total[0, 0]

        out, t = jax.lax.scan(body, Lr, None, length=reps)
        return out[0, 0, 0].astype(jnp.float32) + t.sum().astype(jnp.float32)

    @partial(jax.jit, static_argnames=("reps",))
    def chain_gather_only(total, reps):
        def body(c, _):
            tot_chk = qc_gather_chk(c, qc, dc, B)
            # collapse back to [N, B] with a cheap slice to serialize
            return tot_chk[:, :1, :].sum(axis=0).repeat(N // 1, 0)[:N] * 0.5 + c, None

        out, _ = jax.lax.scan(body, total, None, length=reps)
        return out[0, 0].astype(jnp.float32)

    @partial(jax.jit, static_argnames=("reps",))
    def chain_route_only(Lr, reps):
        def body(c, _):
            Lr_var = qc_route_var(c, qc, dv, B)
            s = jnp.sum(Lr_var.astype(jnp.float32), axis=0)  # [N, B]
            # serialize: cheap transform back to edge shape
            return (c + s[:1, :1].astype(mdt)), None

        out, _ = jax.lax.scan(body, Lr, None, length=reps)
        return out[0, 0, 0].astype(jnp.float32)

    @partial(jax.jit, static_argnames=("reps",))
    def chain_syndrome(total, reps):
        def body(c, _):
            tot_chk = qc_gather_chk(c, qc, dc, B)
            z_chk = (tot_chk.astype(jnp.float32) <= 0).astype(jnp.int32)
            syn_hat = jnp.sum(z_chk, axis=0) & 1
            ok = jnp.all(syn_hat == syn, axis=0)
            return c + ok.astype(mdt)[None, :], None

        out, _ = jax.lax.scan(body, total, None, length=reps)
        return out[0, 0].astype(jnp.float32)

    rows = [
        ("route+total+gather", lambda: chain_route_total(Lr0, llr, reps)),
        ("gather_chk only", lambda: chain_gather_only(total0, reps)),
        ("route_var+sum only", lambda: chain_route_only(Lr0, reps)),
        ("gather+syndrome", lambda: chain_syndrome(total0, reps)),
    ]
    for label, fn in rows:
        t = timed(fn) / reps
        print(f"{label:20s}: {t*1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
