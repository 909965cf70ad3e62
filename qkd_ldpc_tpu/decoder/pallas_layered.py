"""Fused Pallas TPU kernel for the serial check-layered sweep (round 5).

The XLA lowering of the layered schedule (decoder/layered.py) emits one
program step per layer per sweep: every ``t.at[j].add`` / ``Lr.at[ci]``
update round-trips the [z, B] slabs through HBM mb times per sweep, and
the serial layer chain defeats XLA's fusion (benchmarks/layered.md
flagged the per-sweep cost as the open hardware question).  This kernel
runs ONE FULL SWEEP — all mb layers plus the decision-syndrome check —
as a single Pallas program with the whole decoder state resident in
VMEM, so per-sweep HBM traffic drops to exactly one read + one write of
(t, Lr) per frame.

Layout: the kernel works on ``[Bt, z]`` tiles — z on the LANE axis (the
flagship z=512 is 4 full 128-lane tiles), batch on sublanes — so every
circulant rotation is a ``pltpu.roll`` lane rotation (the in-kernel
analog of decoder/qc_routing's contiguous-slice rolls; no gather
descriptors).  The grid iterates over batch tiles only; the mb-layer
sweep is fully unrolled inside the kernel body (all cell offsets and
shifts are static Python ints from the QC layout).

Semantics: bit-identical to the XLA layered loop — same op order, same
storage round-trips (bf16 / int8 fixed-point), same clip placement,
same active-lane gating, same decision-syndrome convention — asserted
per lane for every algorithm x dtype in tests/test_pallas_layered.py
(interpret mode on CPU).  The reference has no layered schedule; the
flooding path remains the reference-parity contract
(src/qkd_ldpc_algorithm.cpp:40-158).

VMEM sizing: with everything resident, a batch tile costs
~4*(nb*ts + ncells*ms)*z bytes of pipelined IO buffers plus temporaries
(`_auto_bt`); the flagship bf16 profile fits Bt=16 in ~7 MB.  When even
the minimum tile cannot fit (huge nb*z), `try_layered_pallas` returns
None and the caller falls back to the XLA loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode


def _roll(x, r: int):
    """Lane rotation: out[:, i] = in[:, (i - r) mod z] (== jnp.roll)."""
    if r == 0:
        return x
    return pltpu.roll(x, r, axis=1)


def _sp_row(lqs, sgn):
    """Sum-product leave-one-out for one layer (mirrors
    bp._check_update_sum_product's op order on a list of [Bt, z] tiles;
    layer rows carry no padded slots, so the mask is identically True)."""
    d = len(lqs)
    th = [jnp.tanh(lq * 0.5) for lq in lqs]
    pre = [None] * d
    suf = [None] * d
    acc = jnp.ones_like(th[0])
    for j in range(d):
        pre[j] = acc
        acc = acc * th[j]
    acc = jnp.ones_like(th[0])
    for j in range(d - 1, -1, -1):
        suf[j] = acc
        acc = acc * th[j]
    outs = []
    for j in range(d):
        x = pre[j] * suf[j] * sgn
        outs.append(jnp.log1p(2.0 * x / (1.0 - x)))
    return outs


def _ms_row(lqs, sgn, alpha, beta):
    """Normalized min-sum for one layer (mirrors
    bp._check_update_min_sum: first-occurrence tie rule, top-2 minima)."""
    d = len(lqs)
    absl = [jnp.abs(lq) for lq in lqs]
    neg = [(lq < 0).astype(jnp.int32) for lq in lqs]
    m1 = absl[0]
    s1 = jnp.zeros_like(neg[0])
    for j in range(1, d):
        upd = absl[j] < m1  # strict: keeps the first occurrence
        s1 = jnp.where(upd, jnp.int32(j), s1)
        m1 = jnp.minimum(m1, absl[j])
    m2 = jnp.full_like(m1, jnp.inf)
    for j in range(d):
        m2 = jnp.minimum(m2, jnp.where(s1 == j, jnp.inf, absl[j]))
    negrow = neg[0]
    for j in range(1, d):
        negrow = negrow + neg[j]
    outs = []
    for j in range(d):
        loo = jnp.where(s1 == j, m2, m1)
        if beta:
            loo = jnp.maximum(loo - beta, 0.0)
        loo_neg = (negrow - neg[j]) & 1
        sign = jnp.where(loo_neg == 1, -1.0, 1.0) * sgn
        outs.append(alpha * sign * loo)
    return outs


def _sweep_kernel(t_ref, lr_ref, syn_ref, act_ref, t_out, lr_out, ok_ref, *,
                  rows, z, nb, threshold, clip, algorithm, alpha, beta,
                  scale, t_dtype):
    """One full layered sweep + decision-syndrome check for one batch tile.

    t_ref/t_out: [nb, Bt, z] total LLRs (llr dtype); lr_ref/lr_out:
    [ncells, Bt, z] check->bit messages (storage dtype); syn_ref:
    [mb, Bt, z] int32 target syndrome; act_ref/ok_ref: [Bt, 1] int32.
    """
    dt = t_dtype
    act_f = act_ref[:].astype(dt)  # [Bt, 1] -> broadcasts over lanes

    def from_storage(q):
        if scale is None:
            return q.astype(dt)
        return q.astype(dt) * scale

    def to_storage(x, like):
        if scale is None:
            return x.astype(like.dtype)
        return jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)

    def clipm(x):
        if clip:
            thr = jnp.asarray(threshold, dt)
            return jnp.clip(x, -thr, thr)
        return x

    t_out[:] = t_ref[:]
    lr_out[:] = lr_ref[:]

    for i, row in enumerate(rows):
        syn_i = syn_ref[i]  # [Bt, z] int32
        sgn = jnp.where(syn_i == 1, -1.0, 1.0).astype(dt)
        lqs = []
        olds = []
        for (ci, j, s) in row:
            old = lr_out[ci]
            olds.append(old)
            lqs.append(
                clipm(_roll(t_out[j], (z - s) % z) - from_storage(old))
            )
        if algorithm == "sum-product":
            outs = _sp_row(lqs, sgn)
        else:
            outs = _ms_row(lqs, sgn, alpha, beta)
        for k, (ci, j, s) in enumerate(row):
            new_q = to_storage(clipm(outs[k]), olds[k])
            delta = from_storage(new_q) - from_storage(olds[k])
            t_out[j] = t_out[j] + _roll(delta, s % z) * act_f
            lr_out[ci] = jnp.where(act_f > 0, new_q, olds[k])

    # Decision syndrome on the post-sweep totals (t <= 0 -> bit 1), same
    # convention as layered.syndrome_ok.
    zdecs = [(t_out[j] <= 0).astype(jnp.int32) for j in range(nb)]
    bad = jnp.zeros_like(act_ref[:])
    for i, row in enumerate(rows):
        p = jnp.zeros_like(zdecs[0])
        for (_, j, s) in row:
            p = p ^ _roll(zdecs[j], (z - s) % z)
        bad = bad + jnp.sum(p ^ syn_ref[i], axis=1, keepdims=True)
    ok_ref[:] = (bad == 0).astype(jnp.int32)


_GRAN = {4: 8, 2: 16, 1: 32}  # itemsize -> min sublane tile


def _auto_bt(z, nb, ncells, mb, t_itemsize, m_itemsize):
    """Largest batch tile fitting the ~13 MB scoped-VMEM stack.

    Per-sublane cost = pipelined IO buffers (2 copies x in+out of t and
    Lr, the int32 syndrome) + ~32 live [Bt, z] temp tiles (the unrolled
    layer body's registers/scratch).  Bt floors to the coarsest sublane
    granularity among the carried dtypes; None = does not fit (caller
    falls back to the XLA loop).
    """
    budget = 13 * 1024 * 1024
    per_bt = z * (4 * nb * t_itemsize + 4 * ncells * m_itemsize
                  + 2 * mb * 4 + 128)
    g = max(_GRAN[t_itemsize], _GRAN[m_itemsize])
    bt = (budget // per_bt) // g * g
    if bt < g:
        return None
    return min(bt, 128)


def _row_tables_cached(code: LDPCCode):
    from qkd_ldpc_tpu.decoder.layered import _row_tables

    z, nb, mb, rows = _row_tables(code.qc)
    rows_t = tuple(tuple(r) for r in rows)
    return z, nb, mb, rows_t


def try_layered_pallas(code, llr, syndrome, opts):
    """Pallas layered decode, or None when the kernel cannot serve this
    configuration (caller falls back to the XLA layered loop):

    - on real TPU hardware, z must be a multiple of 128 (full lane
      tiles; Mosaic lane rotations on ragged tiles are not relied on) —
      interpret mode (CPU tests) has no such limit;
    - the resident state must fit the VMEM budget (`_auto_bt`).
    """
    z, nb, mb, rows = _row_tables_cached(code)
    interpret = jax.default_backend() != "tpu"
    if not interpret and z % 128 != 0:
        return None

    dtype = llr.dtype
    if opts.message_dtype == "bfloat16":
        mdt, scale = jnp.bfloat16, None
    elif opts.message_dtype == "int8":
        mdt, scale = jnp.int8, opts.int8_scale
    else:
        mdt, scale = dtype, None
    ncells = sum(len(r) for r in rows)

    bt = _auto_bt(z, nb, ncells, mb, dtype.itemsize,
                  jnp.dtype(mdt).itemsize)
    if bt is None:
        return None
    return _decode(code, llr, syndrome, opts, z, nb, mb, rows, ncells,
                   mdt, scale, bt, interpret)


def _decode(code, llr, syndrome, opts, z, nb, mb, rows, ncells, mdt,
            scale, bt, interpret):
    B = llr.shape[1]
    dtype = llr.dtype
    Bp = -(-B // bt) * bt

    def pad_b(x, axis):
        if Bp == B:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, Bp - B)
        return jnp.pad(x, widths)

    # [_, z, B] slabs -> [_, B, z]: z on lanes so rotations are lane rolls.
    t0 = pad_b(llr.reshape(nb, z, B).transpose(0, 2, 1), 1)
    syn3 = pad_b(
        syndrome.astype(jnp.int32).reshape(mb, z, B).transpose(0, 2, 1), 1
    )
    Lr0 = jnp.zeros((ncells, Bp, z), mdt)

    kernel = partial(
        _sweep_kernel, rows=rows, z=z, nb=nb,
        threshold=float(opts.message_threshold), clip=opts.clip_messages,
        algorithm=opts.algorithm, alpha=opts.min_sum_alpha,
        beta=opts.min_sum_beta, scale=scale, t_dtype=dtype,
    )

    def spec3(lead):
        return pl.BlockSpec((lead, bt, z), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    spec_b = pl.BlockSpec((bt, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def sweep(t, Lr, syn_l, act_i32):
        Bl = t.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, t.dtype),
                jax.ShapeDtypeStruct(Lr.shape, Lr.dtype),
                jax.ShapeDtypeStruct((Bl, 1), jnp.int32),
            ),
            grid=(Bl // bt,),
            in_specs=[spec3(nb), spec3(ncells), spec3(mb), spec_b],
            out_specs=(spec3(nb), spec3(ncells), spec_b),
            interpret=interpret,
        )(t, Lr, syn_l, act_i32)

    def make_loop(syn_l, frozen=None):
        def body(carry):
            t, Lr, it, iters, done = carry
            act = jnp.logical_not(done)
            if frozen is not None:
                act = act & jnp.logical_not(frozen)
            t, Lr, ok = sweep(t, Lr, syn_l, act.astype(jnp.int32)[:, None])
            it = it + 1
            newly = act & (ok[:, 0] > 0)
            iters = jnp.where(newly, it, iters)
            done = jnp.logical_or(done, newly)
            return t, Lr, it, iters, done

        def run(init, limit):
            def cond(carry):
                _, _, it, _, done = carry
                not_done = jnp.logical_not(done)
                if frozen is not None:
                    not_done = not_done & jnp.logical_not(frozen)
                return jnp.logical_and(it < limit, jnp.any(not_done))

            return jax.lax.while_loop(cond, body, init)

        return run

    def finalize(t, iters, done):
        zt = (t <= 0).astype(jnp.int8)  # [nb, Bp, z]
        z_out = zt.transpose(0, 2, 1).reshape(nb * z, Bp)[:, :B]
        iters = jnp.where(done, jnp.maximum(iters, 1), opts.max_iterations)
        return z_out, iters[:B], done[:B]

    # Padded lanes start done=True: they never gate the early exit and
    # the act mask keeps their state inert for the whole decode.
    done0 = jnp.zeros((Bp,), bool)
    if Bp != B:
        done0 = done0.at[B:].set(True)
    init = (
        t0, Lr0, jnp.asarray(0, jnp.int32), jnp.zeros((Bp,), jnp.int32),
        done0,
    )
    run_full = make_loop(syn3)

    # Residency compaction: same phase A/B/C schedule as the XLA loops
    # (decoder/bp, decoder/layered); the compacted width rounds UP to a
    # whole batch tile — extra lanes ride along in phase B instead of
    # waiting for phase C, which cannot change any lane's trajectory
    # (lane-independent [Bt, z] tile ops).
    B2 = opts.compact_lanes
    if B2 > 0:
        B2 = -(-B2 // bt) * bt
    if not (0 < B2 < Bp and opts.compact_after < opts.max_iterations):
        t, _, _, iters, done = run_full(init, opts.max_iterations)
        return finalize(t, iters, done)

    t_a, Lr_a, it_a, iters_a, done_a = run_full(init, opts.compact_after)

    idx = jnp.argsort(done_a.astype(jnp.int32), stable=True)[:B2]
    run_b = make_loop(jnp.take(syn3, idx, axis=1))
    init_b = (
        jnp.take(t_a, idx, axis=1), jnp.take(Lr_a, idx, axis=1), it_a,
        jnp.take(iters_a, idx, axis=0), jnp.take(done_a, idx, axis=0),
    )
    t_b, Lr_b, _, iters_b, done_b = run_b(init_b, opts.max_iterations)

    t_full = t_a.at[:, idx, :].set(t_b)
    Lr_full = Lr_a.at[:, idx, :].set(Lr_b)
    iters_full = iters_a.at[idx].set(iters_b)
    done_full = done_a.at[idx].set(done_b)
    frozen = jnp.zeros((Bp,), bool).at[idx].set(True)

    overflow = jnp.any(jnp.logical_not(done_full) & jnp.logical_not(frozen))
    run_c = make_loop(syn3, frozen=frozen)

    def phase_c(args):
        t_f, Lr_f, iters_f, done_f = args
        t_o, Lr_o, _, iters_o, done_o = run_c(
            (t_f, Lr_f, it_a, iters_f, done_f), opts.max_iterations
        )
        return t_o, Lr_o, iters_o, done_o

    t, _, iters, done = jax.lax.cond(
        overflow, phase_c, lambda args: args,
        (t_full, Lr_full, iters_full, done_full),
    )
    return finalize(t, iters, done)
