"""Serial check-layered BP schedule for quasi-cyclic codes (round 4).

The reference (and this framework's default path) uses the two-phase
*flooding* schedule: every check node updates from the previous
iteration's variable messages, then every variable node updates
(src/qkd_ldpc_algorithm.cpp:40-158).  The *layered* (serial,
"turbo-decoding message passing") schedule instead sweeps check nodes
in groups, updating the total LLRs IMMEDIATELY after each group — later
layers in the same sweep see earlier layers' corrections, so
information propagates through the graph roughly twice as fast:
layered LDPC decoding converges in about half the iterations of
flooding at equal FER (Hocevar, "A reduced complexity decoder
architecture via layered decoding of LDPC codes", SIPS 2004 — standard
hardware-LDPC practice).

The QC structure makes layers TPU-native: one layer = one base row of
the lift = z independent lifted checks.  Per layer and per base cell
(i, j, shift s):

    Lq  = clip(roll(t[j], s) - Lr_cell)            # bit -> check
    Lr' = check_update(all Lq of the row, syn_i)   # leave-one-out
    t[j] += roll^-1(Lr' - Lr_cell)                 # immediate update

Every routing step is a static circulant block-roll (the same
contiguous-slice primitive as decoder/qc_routing — no gather
descriptors), the leave-one-out runs over the row's <= dc_max slots
(reusing the flooding check-update rules on [d, z, B] stacks), and the
per-layer tensors are [z, B] slabs — MXU/VPU-sized at production z.

Semantics:

- One "iteration" = one full sweep over all mb layers: the same edge
  work as one flooding iteration, so iteration statistics are
  comparable work-wise.  Early exit checks the decision syndrome after
  each sweep; converged frames freeze (active-mask), failures run to
  ``max_iterations`` and report it (reference convention,
  qkd_ldpc_algorithm.cpp:172).
- Trajectories DIFFER from flooding by construction — this is a new
  schedule, not a reference-parity path.  Statistical equivalence
  (FER/iteration curves) is the validation bar: tests/test_layered.py
  on CPU ensembles, benchmarks/layered.md on hardware.
- Message storage dtype, clip placement (bit->check and check->bit both
  clip; layered has no flooding-style "unclipped first iteration"
  because there is no first full-graph message exchange), min-sum
  alpha/beta, and the int8 fixed-point quantization points follow
  DecodeOptions exactly as the flooding loop does.
- Residency compaction (``compact_after``) is a flooding-loop schedule
  knob and is ignored here (layered's per-sweep cost already tracks the
  active set through the early-exit mask semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode
from qkd_ldpc_tpu.codes.qc import qc_cells
from qkd_ldpc_tpu.decoder.bp import (
    DecodeOptions,
    _check_update_min_sum,
    _check_update_sum_product,
)
from qkd_ldpc_tpu.decoder.qc_routing import _rot


def _row_tables(qc) -> tuple[int, int, int, list[list[tuple[int, int, int]]]]:
    """Static per-layer cell tables: row i -> [(cell_index, j, shift)].

    Cell indices order the flat [ncells, z, B] message store by (i, j)
    — ascending j within a row matches the check-major slot order of
    the flooding layout (codes/qc.py check_adjacency_from_cells).
    """
    z, nb, mb, cells = qc_cells(qc)
    order = sorted(cells)  # (i, j) lexicographic
    index = {ij: ci for ci, ij in enumerate(order)}
    rows: list[list[tuple[int, int, int]]] = [[] for _ in range(mb)]
    for (i, j) in order:
        rows[i].append((index[(i, j)], j, cells[(i, j)]))
    return z, nb, mb, rows


def layered_decode_batch_last(
    code: LDPCCode,
    llr: jax.Array,  # [N, B] a-priori LLRs (batch last)
    syndrome: jax.Array,  # [M, B] int target syndrome (batch last)
    opts: DecodeOptions,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Layered decode; returns (z [N,B] int8, iters [B], ok [B])."""
    if code.qc is None:
        raise ValueError(
            "schedule='layered' requires a QC code (codes.qc; generate "
            "with make_qc_code or cli generate --qc)"
        )
    z, nb, mb, rows = _row_tables(code.qc)
    ncells = sum(len(r) for r in rows)
    B = llr.shape[1]
    dtype = llr.dtype

    if opts.message_dtype == "bfloat16":
        mdt, scale = jnp.bfloat16, None
    elif opts.message_dtype == "int8":
        mdt, scale = jnp.int8, opts.int8_scale
    else:
        mdt, scale = dtype, None

    def to_storage(x):
        if scale is None:
            return x.astype(mdt)
        return jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)

    def from_storage(q):
        if scale is None:
            return q.astype(dtype)
        return q.astype(dtype) * scale

    threshold = jnp.asarray(opts.message_threshold, dtype)

    def clip_msgs(x):
        if opts.clip_messages:
            return jnp.clip(x, -threshold, threshold)
        return x

    syndrome = syndrome.astype(jnp.int32)
    syn_rows = syndrome.reshape(mb, z, B)
    sgn_rows = jnp.where(syn_rows == 1, -1.0, 1.0).astype(dtype)

    t0 = llr.reshape(nb, z, B)
    Lr0 = jnp.zeros((ncells, z, B), to_storage(jnp.zeros((), dtype)).dtype)

    ones_masks = {
        d: jnp.ones((d, z), bool) for d in {len(r) for r in rows}
    }

    def sweep(t, Lr, act_f):
        """One serial pass over all layers; act_f [B] gates updates."""
        for i, row in enumerate(rows):
            d = len(row)
            Lq = jnp.stack([
                clip_msgs(_rot(t[j], s) - from_storage(Lr[ci]))
                for (ci, j, s) in row
            ])  # [d, z, B]
            if opts.algorithm == "sum-product":
                Lr_new = _check_update_sum_product(
                    Lq, ones_masks[d], sgn_rows[i]
                )
            else:
                Lr_new = _check_update_min_sum(
                    Lq, ones_masks[d], sgn_rows[i],
                    opts.min_sum_alpha, opts.min_sum_beta,
                )
            Lr_new_q = to_storage(clip_msgs(Lr_new))
            for k, (ci, j, s) in enumerate(row):
                delta = from_storage(Lr_new_q[k]) - from_storage(Lr[ci])
                t = t.at[j].add(_rot(delta, (z - s) % z) * act_f[None, :])
                Lr = Lr.at[ci].set(
                    jnp.where(act_f[None, :] > 0, Lr_new_q[k], Lr[ci])
                )
        return t, Lr

    def syndrome_ok(t):
        """Decision syndrome == target, per frame ([B] bool)."""
        zdec = (t <= 0).astype(jnp.int32)  # [nb, z, B]; total<=0 -> 1
        bad = jnp.zeros((B,), jnp.int32)
        for i, row in enumerate(rows):
            p = jnp.zeros((z, B), jnp.int32)
            for (_, j, s) in row:
                p = p ^ _rot(zdec[j], s)
            bad = bad + jnp.sum(p ^ syn_rows[i], axis=0)
        return bad == 0

    # Iteration counting matches the flooding loop's reference
    # convention: a converged frame reports the sweep at which its
    # decision syndrome first matched (state frozen afterwards by the
    # active mask); failures report max_iterations.
    iters0 = jnp.asarray(0, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def body2(carry):
        t, Lr, it, iters, done = carry
        act_f = jnp.logical_not(done).astype(dtype)
        t, Lr = sweep(t, Lr, act_f)
        it = it + 1
        newly = jnp.logical_and(jnp.logical_not(done), syndrome_ok(t))
        iters = jnp.where(newly, it, iters)
        done = jnp.logical_or(done, newly)
        return t, Lr, it, iters, done

    def cond2(carry):
        _, _, it, _, done = carry
        return jnp.logical_and(it < opts.max_iterations,
                               jnp.logical_not(jnp.all(done)))

    t, Lr, _, iters, done = jax.lax.while_loop(
        cond2, body2,
        (t0, Lr0, iters0, jnp.zeros((B,), jnp.int32), done0),
    )
    z_out = (t <= 0).astype(jnp.int8).reshape(nb * z, B)
    iters = jnp.where(done, jnp.maximum(iters, 1), opts.max_iterations)
    return z_out, iters, done
