"""A/B lab for the streaming Toeplitz hash formulations (round 4).

Interleaved (same process, alternating reps — the shared tunneled chip
drifts +-20%, so never compare across processes): the round-3 two-level
scan (bf16 tiles, inner column scan) vs the round-4 full-width row
blocks (no inner scan, slice-free shear tile) with int8 and bf16
operands.  All variants produce bit-identical parities (exact integer
accumulation in int32 / f32).

Usage (on the TPU): python benchmarks/amplify_lab.py [--n 262144]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@partial(jax.jit, static_argnames=("n_in", "n_out", "bo", "bi", "dt"))
def blocked_r3(s, bits, n_in, n_out, bo, bi, dt="bf16"):
    """The round-3 two-level formulation, parameterized by tile dtype."""
    odt = jnp.int8 if dt == "int8" else jnp.bfloat16
    acc_dt = jnp.int32 if dt == "int8" else jnp.float32
    B = bits.shape[0]
    nI = -(-n_out // bo)
    nJ = -(-n_in // bi)
    s = s.astype(odt)
    s_ext = jnp.concatenate([
        jnp.zeros((bi,), s.dtype), s,
        jnp.zeros((max(nI * bo - n_out, 0) + bo,), s.dtype),
    ])
    x = jnp.pad(bits, ((0, 0), (0, nJ * bi - n_in))).astype(odt)
    xT = x.T.reshape(nJ, bi, B)
    L = bo + bi - 1

    def toeplitz_tile(local):
        v = jnp.concatenate([jnp.flip(local), jnp.zeros((1,), local.dtype)])
        t = jnp.broadcast_to(v, (bo, L + 1)).reshape(-1)[: bo * L]
        return t.reshape(bo, L)[:, bo - 1 : bo - 1 + bi]

    def row_block(I):
        def body(acc, J):
            start = I * bo - J * bi + n_in
            local = jax.lax.dynamic_slice(s_ext, (start,), (L,))
            Tb = toeplitz_tile(local)
            acc = acc + jax.lax.dot_general(
                Tb, xT[J], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt,
            )
            return acc, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((bo, B), acc_dt),
            jnp.arange(nJ, dtype=jnp.int32),
        )
        return (acc.astype(jnp.int32) & 1).astype(jnp.uint8)

    y = jax.lax.map(row_block, jnp.arange(nI, dtype=jnp.int32))
    return y.reshape(nI * bo, B)[:n_out].T


@partial(jax.jit, static_argnames=("n_in", "n_out", "bo", "dt"))
def blocked_r4(s, bits, n_in, n_out, bo, dt):
    """Round-4 full-width row blocks; dt selects the matmul operand
    dtype ('int8' with int32 accumulation, 'bf16' with f32)."""
    B = bits.shape[0]
    nI = -(-n_out // bo)
    L = bo + n_in - 1
    odt = jnp.int8 if dt == "int8" else jnp.bfloat16
    acc_dt = jnp.int32 if dt == "int8" else jnp.float32
    spad = jnp.concatenate(
        [s.astype(odt), jnp.zeros((nI * bo - n_out,), odt)]
    )
    x_ext = jnp.concatenate(
        [jnp.zeros((bo - 1, B), odt), bits.T.astype(odt)], axis=0
    )

    def row_block(I):
        local = jax.lax.dynamic_slice(spad, (I * bo,), (L,))
        v = jnp.concatenate([jnp.flip(local), jnp.zeros((1,), odt)])
        tile = jnp.broadcast_to(v, (bo, L + 1)).reshape(-1)[: bo * L]
        acc = jax.lax.dot_general(
            tile.reshape(bo, L), x_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt,
        )
        return (acc.astype(jnp.int32) & 1).astype(jnp.uint8)

    y = jax.lax.map(row_block, jnp.arange(nI, dtype=jnp.int32))
    return y.reshape(nI * bo, B)[:n_out].T


def blocked_v3(s, bits, n_in, n_out, c):
    """The round-4 diagonal-shared block-Toeplitz path (the shipping
    formulation — postprocess._hash_apply_blocked)."""
    from qkd_ldpc_tpu.postprocess import _hash_apply_blocked

    return _hash_apply_blocked(s, bits, n_in, n_out, c)


def blocked_v3x(s, bits, n_in, n_out, c):
    """v3 with XOR parity accumulation (int8 acc instead of int32) —
    now the production-selectable postprocess._hash_apply_blocked_xor."""
    from qkd_ldpc_tpu.postprocess import _hash_apply_blocked_xor

    return _hash_apply_blocked_xor(s, bits, n_in, n_out, c)


def blocked_v4(s, bits, n_in, n_out, c):
    """Per-DIAGONAL scan (D stack read exactly once, XOR parity) — now
    the production-selectable postprocess._hash_apply_blocked_diag."""
    from qkd_ldpc_tpu.postprocess import _hash_apply_blocked_diag

    return _hash_apply_blocked_diag(s, bits, n_in, n_out, c)


def main():
    import argparse

    from qkd_ldpc_tpu.utils import enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--n-out", type=int, default=125000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    n_in, n_out, B = args.n, args.n_out, args.batch
    bits = jnp.asarray(rng.integers(0, 2, (B, n_in), dtype=np.uint8))
    s_np = rng.integers(0, 2, (n_in + n_out - 1,), dtype=np.uint8)
    s8 = jnp.asarray(s_np, jnp.int8)
    sb = jnp.asarray(s_np, jnp.bfloat16)
    print(f"device: {jax.devices()[0]}  n_in={n_in} n_out={n_out} B={B}",
          file=sys.stderr)

    variants = {
        "v3-diag c=256": lambda: blocked_v3(s8, bits, n_in, n_out, 256),
        "v3-diag c=128": lambda: blocked_v3(s8, bits, n_in, n_out, 128),
        "v3x-xor c=128": lambda: blocked_v3x(s8, bits, n_in, n_out, 128),
        "v3x-xor c=256": lambda: blocked_v3x(s8, bits, n_in, n_out, 256),
        "v3x-xor c=512": lambda: blocked_v3x(s8, bits, n_in, n_out, 512),
        "v4-perdiag c=128": lambda: blocked_v4(s8, bits, n_in, n_out, 128),
        "v4-perdiag c=256": lambda: blocked_v4(s8, bits, n_in, n_out, 256),
        "v4-perdiag c=512": lambda: blocked_v4(s8, bits, n_in, n_out, 512),
    }
    outs = {}
    for name, fn in variants.items():
        outs[name] = np.asarray(fn())  # compile + warm
        print(f"compiled {name}", file=sys.stderr, flush=True)
    ref = outs["v3-diag c=256"]
    for name, o in outs.items():
        assert np.array_equal(o, ref), f"{name} output differs"
    print("all variants bit-identical", file=sys.stderr)

    times = {name: [] for name in variants}
    for _ in range(args.reps):  # interleave A/B reps
        for name, fn in variants.items():
            t0 = time.perf_counter()
            np.asarray(fn())
            times[name].append(time.perf_counter() - t0)
    for name in variants:
        t = float(np.median(times[name]))
        print(f"{name:>22}: {t*1e3:8.1f} ms/call "
              f"({B / t:6.1f} frames/s)")


if __name__ == "__main__":
    main()
