"""Roll-based message routing for quasi-cyclic codes.

The decode loop's two routing permutations (check-major gather of the
totals, variable-major gather of the check messages — the TPU-native
replacement for the reference's cursor scatters,
``src/qkd_ldpc_algorithm.cpp:56-72,128-139``) are general row gathers
for an unstructured code: ~300 GB/s on TPU because each row is a
descriptor (benchmarks/roofline.md).  For a QC code (codes.qc) every
routed row lives in a contiguous ``[z, B]`` circulant slab at a static
offset with a static rotation, so both directions compile to pure
contiguous slice-copies — no gather descriptors at all — and stream at
HBM copy bandwidth.

Bit-exactness: rolls are permutations of exactly the rows the gather
path reads, assembled into identically-shaped tensors and consumed by
identical arithmetic, so the decode trajectory is bit-identical to the
gather path on the same code (tests/test_qc.py asserts decisions and
iteration counts for both algorithms and all message dtypes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# Lowering of the roll permutation: "auto" picks by jax.default_backend()
# AT TRACE TIME; "slices" / "take" force one variant (tests).  Trace-time
# constraint, documented: a program traced on CPU and exported for TPU
# keeps the gather variant — results are identical either way (the two
# lowerings are the same permutation, asserted by
# tests/test_qc.py::test_rot_lowerings_agree), only the TPU-side speed
# differs, and every production TPU path traces on the TPU backend.
_ROT_LOWERING = "auto"  # "auto" | "slices" | "take"


def _rot(block, s: int):
    """[z, B] slab rotated so row r reads input row (r + s) mod z.

    Two lowerings of the SAME permutation: contiguous slice-copies on
    TPU (the descriptor-free fast path this module exists for), a
    static-index gather elsewhere — XLA:CPU's codegen for the heavily
    repeated concat-of-slices pattern segfaulted nondeterministically
    (observed four times across long test runs; the gather lowering is
    the same op class CPU tests exercise everywhere else).  Identical
    results either way, so the CPU bit-identity tests validate the
    routing math and the TPU parity sweeps validate the slice lowering.
    """
    if s == 0:
        return block
    mode = _ROT_LOWERING
    if mode == "auto":
        mode = "slices" if jax.default_backend() == "tpu" else "take"
    if mode == "slices":
        return jnp.concatenate([block[s:], block[:s]], axis=0)
    z = block.shape[0]
    idx = np.concatenate([np.arange(s, z), np.arange(s)])
    return jnp.take(block, jnp.asarray(idx), axis=0)


def qc_gather_chk(x, qc, dc: int, B: int):
    """[N, B] variable-major rows -> [dc, M, B] check-major slots.

    Equivalent to ``jnp.take(x, chk_adj_T)``: slot j of check i*z + r
    reads variable col*z + (r + s) mod z.  Padded slots (base rows
    shorter than dc_max) are zero-filled — they are masked everywhere
    downstream, exactly like the gather path's sentinel reads.
    """
    z, chk_plan, _ = qc
    nb = x.shape[0] // z
    xb = x.reshape(nb, z, B)
    zeros = None
    slabs = []
    # Per-slot concat + stack, NOT one flat concatenate: the flat form
    # wins an isolated microbenchmark (0.050 vs 0.073 ms — single output
    # buffer) but LOSES 14% end-to-end in the real decode program
    # (interleaved A/B, 457 vs 401 Minfo-bits/s) — the stacked form
    # fuses better with the syndrome/kernel consumers.  Fusion context
    # beats isolated op speed; measure any change to this shape in the
    # full program.
    for j in range(dc):
        per_i = []
        for (col, s) in chk_plan[j]:
            if col < 0:
                if zeros is None:
                    zeros = jnp.zeros((z, B), x.dtype)
                per_i.append(zeros)
            else:
                per_i.append(_rot(xb[col], s))
        slabs.append(jnp.concatenate(per_i, axis=0))
    return jnp.stack(slabs, axis=0)


def qc_route_var(Lr, qc, dv: int, B: int):
    """[dc, M, B] check-major messages -> [dv, N, B] variable-major.

    Equivalent to the gather path's ``jnp.take(flat, var_slot_T)``:
    variable jb*z + q's k-th message (ascending check order) reads slot
    ``slot_k`` of check i_k*z + (q - s_k) mod z — the inverse rotation
    of the slab the forward direction rolled.
    """
    z, _, var_plan = qc
    dc, M, _ = Lr.shape
    mb = M // z
    Lrb = Lr.reshape(dc, mb, z, B)
    zeros = None
    outs = []
    for k in range(dv):
        per_j = []
        for (slot, i, s) in var_plan[k]:
            if slot < 0:
                if zeros is None:
                    zeros = jnp.zeros((z, B), Lr.dtype)
                per_j.append(zeros)
            else:
                per_j.append(_rot(Lrb[slot, i], (z - s) % z))
        outs.append(jnp.concatenate(per_j, axis=0))
    return jnp.stack(outs, axis=0)
