"""Sharded Monte-Carlo sweep: trial-grid data parallelism over a mesh.

The device step is identical math to the single-chip runner
(``qkd_ldpc_tpu.sim.runner``): generate trials from global trial ids,
decode, reduce to seven stat scalars.  Sharding the trial-id vector over
the ``trial`` mesh axis makes every per-trial tensor device-local; XLA
auto-partitions the whole program (all ops are batch-parallel) and inserts
a single all-reduce for the final scalar sums — the entire communication
cost of the sweep, riding ICI.

Determinism: trial t's keys depend only on (master seed, point index, t)
via ``fold_in`` — results are bit-identical across 1 chip, 8 chips, or a
multi-host pod (the reference achieves the thread-count analog of this
with its ``seeds[k] + curr_sim`` scheme, ``src/simulation.cpp:247``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qkd_ldpc_tpu.channel.keys import make_trials_from_ids, num_errors_for
from qkd_ldpc_tpu.codes.ldpc_code import LDPCCode
from qkd_ldpc_tpu.decoder.bp import DecodeOptions
from qkd_ldpc_tpu.decoder.reconcile import reconcile
from qkd_ldpc_tpu.parallel.mesh import TRIAL_AXIS, trial_sharding, replicated
from qkd_ldpc_tpu.sim.stats import (
    PointPartials,
    partials_from_stacked,
    reduce_trials,
    stack_partials,
)


@partial(jax.jit, static_argnames=("n_bits", "opts"), donate_argnums=())
def _sharded_point_step(
    code: LDPCCode,
    point_key: jax.Array,
    trial_ids: jax.Array,  # [B] uint32, sharded over the trial axis
    valid: jax.Array,  # [B] bool, same sharding
    num_errors: jax.Array,  # scalar int32
    n_bits: int,
    opts: DecodeOptions,
) -> dict[str, jax.Array]:
    alice, bob = make_trials_from_ids(point_key, n_bits, trial_ids, num_errors)
    actual_qber = num_errors.astype(jnp.float32) / n_bits
    res = reconcile(code, alice, bob, actual_qber, opts)
    # Stacked [7] int32: one fetch per batch (see sim.stats.stack_partials).
    return stack_partials(
        reduce_trials(
            res.syndromes_match, res.keys_match, res.iterations,
            opts.max_iterations, valid,
        )
    )


def run_point_node_sharded(
    code: LDPCCode,
    point_key: jax.Array,
    qber: float,
    trials: int,
    batch: int,
    opts: DecodeOptions,
    mesh: Mesh,
    tick: Callable[[int], None] | None = None,
) -> tuple[PointPartials, float]:
    """One sweep point on a 2-D (trial, node) mesh: the batch shards over
    ``trial`` while every frame's variable nodes shard over ``node``
    (:func:`parallel.node_sharded.bp_decode_node_sharded`) — the sweep-level
    composition of data parallelism with intra-frame model parallelism,
    for frames too large (or too latency-critical) for one chip.

    Statistics are bit-identical to the single-chip runner.
    """
    from qkd_ldpc_tpu.decoder.reconcile import apriori_llr
    from qkd_ldpc_tpu.decoder.syndrome import syndrome as syndrome_fn
    from qkd_ldpc_tpu.parallel.node_sharded import bp_decode_node_sharded

    n_err = num_errors_for(code.n_vars, qber)
    if n_err == 0:
        raise ValueError(f"Key size '{code.n_vars}' is too small for QBER.")
    actual_qber = n_err / code.n_vars

    n_trial_shards = mesh.shape.get(TRIAL_AXIS, 1)
    batch = -(-batch // n_trial_shards) * n_trial_shards

    @partial(jax.jit, static_argnames=("n_bits", "o"))
    def step(code, point_key, trial_ids, valid, num_errors, n_bits, o):
        alice, bob = make_trials_from_ids(point_key, n_bits, trial_ids, num_errors)
        aq = num_errors.astype(jnp.float32) / n_bits
        llr = apriori_llr(bob, aq)
        syn = syndrome_fn(code, alice)
        z, iters, ok = bp_decode_node_sharded(code, llr.T, syn.T, o, mesh)
        keys_match = jnp.all(z.T.astype(jnp.int8) == alice.astype(jnp.int8), axis=-1)
        return stack_partials(
            reduce_trials(ok, keys_match, iters, o.max_iterations, valid)
        )

    total = PointPartials()
    offset = 0
    while offset < trials:
        n_valid = min(batch, trials - offset)
        trial_ids = jnp.arange(batch, dtype=jnp.uint32) + jnp.uint32(offset)
        valid = jnp.arange(batch, dtype=jnp.int32) < n_valid
        stacked = step(
            code, point_key, trial_ids, valid,
            jnp.asarray(n_err, jnp.int32), code.n_vars, opts,
        )
        total = total.merge(partials_from_stacked(jax.device_get(stacked)))
        offset += n_valid
        if tick is not None:
            tick(n_valid)
    return total, actual_qber


def run_point_sharded(
    code: LDPCCode,
    point_key: jax.Array,
    qber: float,
    trials: int,
    batch: int,
    opts: DecodeOptions,
    mesh: Mesh,
    tick: Callable[[int], None] | None = None,
) -> tuple[PointPartials, float]:
    """All trials of one (matrix, QBER) point, sharded over ``mesh``.

    ``batch`` is the *global* batch (rounded up to a multiple of the trial
    axis size); the tail is masked out, so partial sums are exactly those
    of the unsharded runner.
    """
    n_err = num_errors_for(code.n_vars, qber)
    if n_err == 0:
        raise ValueError(f"Key size '{code.n_vars}' is too small for QBER.")
    actual_qber = n_err / code.n_vars

    n_shards = mesh.shape[TRIAL_AXIS]
    batch = -(-batch // n_shards) * n_shards  # round up to shard multiple
    shard = trial_sharding(mesh)
    repl = replicated(mesh)

    code_dev = jax.device_put(code, repl)
    point_key = jax.device_put(point_key, repl)

    total = PointPartials()
    offset = 0
    while offset < trials:
        n_valid = min(batch, trials - offset)
        # make_array_from_callback builds each device's shard locally, so
        # this path also works multi-host (jax.distributed), where a plain
        # device_put of a host-local array onto a global sharding cannot.
        off = offset
        trial_ids = jax.make_array_from_callback(
            (batch,), shard,
            lambda idx: np.arange(batch, dtype=np.uint32)[idx] + np.uint32(off),
        )
        valid = jax.make_array_from_callback(
            (batch,), shard,
            lambda idx: (np.arange(batch, dtype=np.int32) < n_valid)[idx],
        )
        stacked = _sharded_point_step(
            code_dev, point_key, trial_ids, valid,
            jnp.asarray(n_err, jnp.int32), code.n_vars, opts,
        )
        total = total.merge(
            partials_from_stacked(jax.device_get(stacked))
        )
        offset += n_valid
        if tick is not None:
            tick(n_valid)
    return total, actual_qber
