"""Batched syndrome-target belief-propagation decoding.

TPU-native re-design of the reference's hot kernel
(``sum_product_decoding_regular`` / ``_irregular``, reference
``src/qkd_ldpc_algorithm.cpp:3-345``).  Differences from the reference, all
deliberate (see SURVEY.md §3.5 and §7):

- **One code path** for regular and irregular codes: padded index tensors +
  masks instead of two hand-specialized scalar loops.
- **Scatter-free message routing**: the reference moves messages between
  check-major and variable-major layouts with sequential cursor scatters
  (``check_pos_idx`` / ``bit_pos_idx``, qkd_ldpc_algorithm.cpp:56-72,
  128-139).  Here both directions are permutation *gathers* with
  precomputed static index tensors (``LDPCCode.var_slot`` /
  ``LDPCCode.chk_slot``) — vectorizable and shardable.
- **Sign/log-magnitude leave-one-out** check update instead of the
  reference's ``row_prod / tanh_j`` division (qkd_ldpc_algorithm.cpp:67),
  which is numerically fragile in f32 (|Q| can exceed 1 by rounding and
  NaN through atanh).  The log-magnitude form guarantees |Q| <= 1; exact
  saturation (|Q| == 1 -> atanh = inf) is then clipped by the message
  threshold exactly as the reference clips (threshold applied to
  check-to-bit messages right after the check update, and to bit-to-check
  messages after the bit update — call sites qkd_ldpc_algorithm.cpp:74-77,
  141-144).
- **Batch ("frame") axis in lanes**: all loop state is laid out batch-LAST
  (e.g. messages ``[M, dc_max, B]``) so that every message-routing gather
  indexes the leading axes with static indices and moves 128-lane rows of
  frames at once.
- **Early exit inside `lax.while_loop`** with per-frame convergence masks:
  frame b records ``iterations = it + 1`` on the iteration where its
  decision syndrome first equals the target (the reference's semantics at
  qkd_ldpc_algorithm.cpp:105-126: decision + syndrome check happen *before*
  the bit-node update, and a converged frame skips the bit update).

The decision rule is the reference's: ``total <= 0 -> bit = 1``
(qkd_ldpc_algorithm.cpp:87-94).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode

_TINY = 1e-30  # magnitude floor: keeps log finite; tanh==0 is pathological


class DecodeResult(NamedTuple):
    """Per-frame decode outcome (batch-first).

    Fields mirror the reference's ``SP_result``
    (``src/qkd_ldpc_algorithm.hpp:14-18``) plus the hard decisions.
    """

    bits: jax.Array  # [B, N] int8 hard decisions
    iterations: jax.Array  # [B] int32; == max_iters when not converged
    syndromes_match: jax.Array  # [B] bool


@dataclasses.dataclass(frozen=True)
class DecodeOptions:
    """Static decoder knobs (compiled into the jitted program).

    In the reference these live in the global ``CFG`` and are read inside
    the hot loop (``src/config.hpp:23-65``); here they are explicit and
    static.
    """

    max_iterations: int = 100
    clip_messages: bool = True  # ENABLE_SUM_PRODUCT_MSG_LLR_THRESHOLD
    message_threshold: float = 100.0  # SUM_PRODUCT_MSG_LLR_THRESHOLD
    algorithm: str = "sum-product"  # "sum-product" | "min-sum"
    min_sum_alpha: float = 0.8  # normalized min-sum scaling
    # Storage dtype of the edge-message state.  "bfloat16" halves the HBM
    # traffic of the decode loop (the TPU bottleneck); all transcendentals,
    # row reductions, and totals still compute in float32, and only the
    # per-edge messages round through bf16.  Hard-decision/iteration parity
    # vs float32 is validated in
    # tests/test_decoder.py::test_bf16_messages_match_f32_decisions, and
    # the FER bias at the waterfall is quantified in benchmarks/.
    message_dtype: str = "float32"  # "float32" | "bfloat16"
    # Check-update implementation: "pallas" (hand-written VMEM-tiled
    # kernel, decoder.pallas_kernels — measured ~24% faster end-to-end
    # than the XLA lowering on TPU v5e, benchmarks/pallas_vs_xla.md),
    # "xla" (fused jnp), or "auto" (pallas on TPU — both the sum-product
    # and min-sum kernels exist — xla otherwise; pallas interpret mode on
    # CPU is debug-only slow).
    backend: str = "auto"  # "auto" | "xla" | "pallas"

    def __post_init__(self):
        if self.algorithm not in ("sum-product", "min-sum"):
            raise ValueError(f"Unknown algorithm {self.algorithm!r}")
        if self.message_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"Unknown message_dtype {self.message_dtype!r}")
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"Unknown backend {self.backend!r}")

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if jax.default_backend() == "tpu" else "xla"


def _check_update_sum_product(
    Lq: jax.Array, chk_mask: jax.Array, syn_sign: jax.Array
) -> jax.Array:
    """Tanh-rule check-node update with syndrome sign, leave-one-out.

    Lq: [M, dc, B] bit->check messages; syn_sign: [M, B] in {+1, -1}.
    Returns check->bit messages in check-major layout, same shape.
    """
    t = jnp.tanh(Lq * 0.5)
    t = jnp.where(chk_mask[:, :, None], t, 1.0)
    mag = jnp.maximum(jnp.abs(t), _TINY)
    logmag = jnp.log(mag)
    neg = jnp.where(chk_mask[:, :, None], t < 0, False)

    log_row = jnp.sum(logmag, axis=1, keepdims=True)  # [M, 1, B]
    neg_row = jnp.sum(neg.astype(jnp.int32), axis=1, keepdims=True)

    # Leave-one-out sign: total parity minus own sign bit.
    loo_neg = (neg_row - neg.astype(jnp.int32)) & 1
    sign = jnp.where(loo_neg == 1, -1.0, 1.0) * syn_sign[:, None, :]

    # Leave-one-out magnitude q = exp(log_row - logmag), computed as
    # exp(log_row) / mag: ONE exp per check row instead of one per edge
    # (transcendentals dominate the VPU cost of this kernel).  Nearest
    # rounding keeps log_row <= every logmag (a float sum of non-positives
    # never rounds above any single term), so mathematically q <= 1; the
    # division can still land at 1 + ulp, hence the explicit cap — q == 1
    # yields +inf, which the message threshold clips exactly as the
    # reference clips its atanh overflow (qkd_ldpc_algorithm.cpp:74-77).
    q = jnp.minimum(jnp.exp(log_row) / mag, 1.0)
    # 2*atanh(q) = log1p(2q / (1-q)): one log1p instead of two.
    lr = sign * jnp.log1p(2.0 * q / (1.0 - q))
    return lr


def _check_update_min_sum(
    Lq: jax.Array, chk_mask: jax.Array, syn_sign: jax.Array, alpha: float
) -> jax.Array:
    """Normalized min-sum check-node update (fast approximate variant).

    Leave-one-out min via the top-2 minima trick; the scaling factor
    ``alpha`` compensates min-sum's overestimate of |message|.
    """
    mask3 = chk_mask[:, :, None]
    absL = jnp.where(mask3, jnp.abs(Lq), jnp.inf)
    neg = jnp.where(mask3, Lq < 0, False)

    min1 = jnp.min(absL, axis=1, keepdims=True)  # [M, 1, B]
    is_min1 = absL == min1
    # Mask the *first* occurrence of the minimum to get the second minimum;
    # cumulative trick keeps ties correct (second min == min1 then).
    first_min1 = jnp.cumsum(is_min1.astype(jnp.int32), axis=1) * is_min1 == 1
    absL2 = jnp.where(first_min1, jnp.inf, absL)
    min2 = jnp.min(absL2, axis=1, keepdims=True)

    loo_min = jnp.where(first_min1, min2, min1)
    neg_row = jnp.sum(neg.astype(jnp.int32), axis=1, keepdims=True)
    loo_neg = (neg_row - neg.astype(jnp.int32)) & 1
    sign = jnp.where(loo_neg == 1, -1.0, 1.0) * syn_sign[:, None, :]
    return alpha * sign * loo_min


def _route(flat: jax.Array, slots: jax.Array, out_rows: int, out_cols: int) -> jax.Array:
    """Gather flat [S, B] messages through a permutation map with sentinel.

    ``flat`` is the flattened source layout with batch last; a zero row is
    appended so sentinel-padded slots read a neutral 0.
    """
    padded = jnp.concatenate([flat, jnp.zeros((1, flat.shape[1]), flat.dtype)], axis=0)
    return jnp.take(padded, slots.reshape(-1), axis=0).reshape(
        out_rows, out_cols, flat.shape[1]
    )


def bp_decode_batch_last(
    code: LDPCCode,
    llr: jax.Array,  # [N, B] a-priori LLRs (batch last)
    syndrome: jax.Array,  # [M, B] int target syndrome (batch last)
    opts: DecodeOptions,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Core batched decode loop; returns (z [N,B] int8, iters [B], ok [B])."""
    N, M = code.n_vars, code.n_checks
    dv, dc = code.dv_max, code.dc_max
    B = llr.shape[1]
    dtype = llr.dtype
    backend = opts.resolve_backend()
    # Storage dtype of the big per-edge tensors; compute stays in `dtype`.
    mdt = jnp.bfloat16 if opts.message_dtype == "bfloat16" else dtype

    chk_adj = jnp.asarray(code.chk_adj)
    chk_mask = jnp.asarray(code.chk_mask)
    var_slot = jnp.asarray(code.var_slot)

    syndrome = syndrome.astype(jnp.int32)
    syn_sign = jnp.where(syndrome == 1, -1.0, 1.0).astype(dtype)  # [M, B]
    threshold = jnp.asarray(opts.message_threshold, dtype)

    # Message initialization: Lq[c, j] = llr[chk_adj[c, j]]
    # (reference qkd_ldpc_algorithm.cpp:10-18).
    Lq0 = jnp.take(llr, chk_adj.reshape(-1), axis=0).reshape(M, dc, B).astype(mdt)

    def clip_msgs(x):
        if opts.clip_messages:
            return jnp.clip(x, -threshold, threshold)
        return x

    def body(carry):
        Lq, z_out, iters, done, it = carry

        # (1) check-node update, check-major layout (compute in f32)
        if backend == "pallas":
            from qkd_ldpc_tpu.decoder.pallas_kernels import check_update_pallas

            Lr_chk = check_update_pallas(
                Lq, chk_mask.astype(jnp.int32), syn_sign,
                threshold=opts.message_threshold, clip=opts.clip_messages,
                interpret=jax.default_backend() != "tpu",
                algorithm=opts.algorithm, min_sum_alpha=opts.min_sum_alpha,
            )
        else:
            Lq_f = Lq.astype(dtype)
            if opts.algorithm == "min-sum":
                Lr_chk = _check_update_min_sum(
                    Lq_f, chk_mask, syn_sign, opts.min_sum_alpha
                )
            else:
                Lr_chk = _check_update_sum_product(Lq_f, chk_mask, syn_sign)
            Lr_chk = clip_msgs(Lr_chk).astype(mdt)

        # (2) route check->bit messages to variable-major layout
        Lr_var = _route(Lr_chk.reshape(M * dc, B), var_slot, N, dv)

        # (3) totals + hard decision (total <= 0 -> 1)
        total = llr + jnp.sum(Lr_var.astype(dtype), axis=1)  # [N, B]
        z = (total <= 0).astype(jnp.int8)

        # (4+5) one gather of totals into check-major slots serves BOTH the
        # decision syndrome and the bit-node update: the extrinsic message
        # on edge (c, j) with variable v is total[v] - Lr_var[v, k(c,j)]
        # == total[chk_adj[c,j]] - Lr_chk[c,j] (same edge, two layouts) —
        # so the second routing gather of the naive formulation cancels.
        tot_chk = jnp.take(total, chk_adj.reshape(-1), axis=0).reshape(M, dc, B)
        z_chk = jnp.where(chk_mask[:, :, None], (tot_chk <= 0).astype(jnp.int32), 0)
        syn_hat = jnp.sum(z_chk, axis=1) & 1
        ok = jnp.all(syn_hat == syndrome, axis=0)  # [B]

        active = jnp.logical_not(done)
        z_out = jnp.where(active[None, :], z, z_out)
        iters = jnp.where(active, it + 1, iters)
        done = jnp.logical_or(done, ok)

        Lq_new = clip_msgs(tot_chk - Lr_chk.astype(dtype)).astype(mdt)
        return Lq_new, z_out, iters, done, it + 1

    def cond(carry):
        _, _, _, done, it = carry
        return jnp.logical_and(it < opts.max_iterations, ~jnp.all(done))

    init = (
        Lq0,
        jnp.zeros((N, B), jnp.int8),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
        jnp.asarray(0, jnp.int32),
    )
    _, z_out, iters, done, _ = jax.lax.while_loop(cond, body, init)

    # Frames that never converged report max_iterations, as the reference
    # returns {max_num_iterations, false} (qkd_ldpc_algorithm.cpp:172).
    iters = jnp.where(done, iters, opts.max_iterations)
    return z_out, iters, done


# DecodeOptions is frozen/hashable -> a static jit argument; LDPCCode is a
# pytree whose shape metadata is static, so each (code shape, batch, opts)
# combination compiles once and is cached.
_bp_decode_jit = jax.jit(bp_decode_batch_last, static_argnames=("opts",))


def decode(
    code: LDPCCode,
    llr: jax.Array,  # [B, N] or [N]
    syndrome: jax.Array,  # [B, M] or [M]
    opts: DecodeOptions = DecodeOptions(),
) -> DecodeResult:
    """Decode a batch of frames toward target syndromes (batch-first API)."""
    single = llr.ndim == 1
    if single:
        llr = llr[None, :]
        syndrome = syndrome[None, :]
    z, iters, ok = _bp_decode_jit(code, llr.T, syndrome.T, opts)
    res = DecodeResult(bits=z.T, iterations=iters, syndromes_match=ok)
    if single:
        res = DecodeResult(res.bits[0], res.iterations[0], res.syndromes_match[0])
    return res
