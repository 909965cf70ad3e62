"""Intra-frame node-sharded decoding vs the single-chip decoder.

Variable-node partition over a virtual 8-device mesh (SURVEY.md §5
"long-context / sequence parallelism" analog): results must be bit-exact
with :func:`qkd_ldpc_tpu.decoder.bp.decode` — same hard decisions, same
per-frame iteration counts, same convergence verdicts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
from qkd_ldpc_tpu.decoder import DecodeOptions, decode
from qkd_ldpc_tpu.decoder.reconcile import apriori_llr
from qkd_ldpc_tpu.decoder.syndrome import syndrome
from qkd_ldpc_tpu.parallel import decode_node_sharded, make_mesh
from qkd_ldpc_tpu.parallel.mesh import NODE_AXIS


def _trial_llr_syn(code, qber, batch, seed):
    n_err = num_errors_for(code.n_vars, qber)
    alice, bob = make_trial_batch(
        jax.random.PRNGKey(seed), code.n_vars, batch,
        jnp.asarray(n_err, jnp.int32),
    )
    llr = apriori_llr(bob, n_err / code.n_vars)
    syn = syndrome(code, alice)
    return alice, llr, syn


@pytest.mark.parametrize("n_node", [2, 4, 8])
def test_node_sharded_matches_single_chip(medium_code, n_node):
    """N=512 divides all tested node counts: pure sharding, no padding."""
    mesh = make_mesh(n_trial=8 // n_node, n_node=n_node)
    opts = DecodeOptions(max_iterations=60)
    _, llr, syn = _trial_llr_syn(medium_code, 0.03, batch=16, seed=5)

    ref = decode(medium_code, llr, syn, opts)
    out = decode_node_sharded(medium_code, llr, syn, opts, mesh)

    np.testing.assert_array_equal(
        np.asarray(out.syndromes_match), np.asarray(ref.syndromes_match)
    )
    np.testing.assert_array_equal(
        np.asarray(out.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))
    assert np.asarray(ref.syndromes_match).any()  # non-trivial case


def test_node_sharded_padding(hamming_code):
    """N=7 does not divide 8 shards: dummy-variable padding must not
    perturb results."""
    mesh = make_mesh(n_trial=1, n_node=8)
    opts = DecodeOptions(max_iterations=20)
    _, llr, syn = _trial_llr_syn(hamming_code, 0.15, batch=8, seed=2)

    ref = decode(hamming_code, llr, syn, opts)
    out = decode_node_sharded(hamming_code, llr, syn, opts, mesh)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))
    np.testing.assert_array_equal(
        np.asarray(out.iterations), np.asarray(ref.iterations)
    )


def test_node_sharded_single_frame(johnson_code):
    """Single-frame (unbatched) API parity on the Johnson toy code."""
    mesh = make_mesh(n_trial=1, n_node=8)
    opts = DecodeOptions(max_iterations=10)
    _, llr, syn = _trial_llr_syn(johnson_code, 0.2, batch=1, seed=0)

    ref = decode(johnson_code, llr[0], syn[0], opts)
    out = decode_node_sharded(johnson_code, llr[0], syn[0], opts, mesh)
    assert int(out.iterations) == int(ref.iterations)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))


@pytest.mark.parametrize("n_node", [2, 8])
def test_node_sharded_min_sum_bit_exact(medium_code, n_node):
    """Min-sum's check reductions (min, integer sign counts) are exactly
    associative, so the node-sharded decoder is BIT-IDENTICAL to the
    single-chip kernel on any mesh — including the top-2 tie rule
    (first occurrence of the row minimum in check-major slot order)."""
    mesh = make_mesh(n_trial=8 // n_node, n_node=n_node)
    opts = DecodeOptions(algorithm="min-sum", max_iterations=60)
    _, llr, syn = _trial_llr_syn(medium_code, 0.03, batch=16, seed=5)

    ref = decode(medium_code, llr, syn, opts)
    out = decode_node_sharded(medium_code, llr, syn, opts, mesh)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))
    np.testing.assert_array_equal(
        np.asarray(out.iterations), np.asarray(ref.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(out.syndromes_match), np.asarray(ref.syndromes_match)
    )
    assert np.asarray(ref.syndromes_match).any()


def test_node_sharded_min_sum_forced_tie(medium_code):
    """Force |message| ties inside check rows (quantized LLRs) and check
    the distributed tie rule still matches the single-chip kernel."""
    mesh = make_mesh(n_trial=1, n_node=8)
    opts = DecodeOptions(algorithm="min-sum", max_iterations=30)
    _, llr, syn = _trial_llr_syn(medium_code, 0.03, batch=8, seed=11)
    # Quantize to multiples of 0.25: many exact |Lq| collisions per row.
    llr = jnp.round(llr * 4.0) / 4.0
    ref = decode(medium_code, llr, syn, opts)
    out = decode_node_sharded(medium_code, llr, syn, opts, mesh)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))
    np.testing.assert_array_equal(
        np.asarray(out.iterations), np.asarray(ref.iterations)
    )


@pytest.mark.parametrize("algorithm", ["sum-product", "min-sum"])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_node_sharded_quantized_messages(medium_code, algorithm, dtype):
    """Quantized message storage matches the single-chip decoder on the
    node-sharded path (decisions + iteration counts).

    The round-3 (total, Lr) carry gives the node-sharded loop the SAME
    quantization points as the single-chip fused loop — totals and Lr
    round through the storage dtype, Lq never does — so min-sum equality
    here is structural (exact reductions over identically-rounded
    inputs), not fixture luck; sum-product remains subject to the f32
    cross-formulation rounding caveat on other inputs."""
    mesh = make_mesh(n_trial=2, n_node=4)
    opts = DecodeOptions(
        algorithm=algorithm, max_iterations=60, message_dtype=dtype
    )
    _, llr, syn = _trial_llr_syn(medium_code, 0.03, batch=16, seed=5)
    ref = decode(medium_code, llr, syn, opts)
    out = decode_node_sharded(medium_code, llr, syn, opts, mesh)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))
    np.testing.assert_array_equal(
        np.asarray(out.iterations), np.asarray(ref.iterations)
    )


def test_node_only_mesh(medium_code):
    """A pure 1-D node mesh (no trial axis) also works: batch replicated."""
    devices = np.asarray(jax.devices())
    from jax.sharding import Mesh

    mesh = Mesh(devices.reshape(-1), (NODE_AXIS,))
    opts = DecodeOptions(max_iterations=40)
    _, llr, syn = _trial_llr_syn(medium_code, 0.02, batch=4, seed=9)
    ref = decode(medium_code, llr, syn, opts)
    out = decode_node_sharded(medium_code, llr, syn, opts, mesh)
    np.testing.assert_array_equal(np.asarray(out.bits), np.asarray(ref.bits))


def test_node_sharded_sweep_matches_single_chip(medium_code):
    """A sweep point on a 2-D (trial, node) mesh must produce the same
    statistics as the single-chip runner (trial x intra-frame composition)."""
    from qkd_ldpc_tpu.parallel import run_point_node_sharded
    from qkd_ldpc_tpu.sim.runner import run_point

    key = jax.random.fold_in(jax.random.PRNGKey(777), 2)
    opts = DecodeOptions(max_iterations=50)
    p1, q1 = run_point(medium_code, key, 0.03, trials=40, batch=40, opts=opts)
    mesh = make_mesh(n_trial=4, n_node=2)
    p2, q2 = run_point_node_sharded(
        medium_code, key, 0.03, trials=40, batch=40, opts=opts, mesh=mesh
    )
    assert q1 == q2 and p1.n_trials == p2.n_trials == 40
    assert (p1.n_sp, p1.n_ldpc, p1.sum_it, p1.sum_it2, p1.min_it, p1.max_it) == \
           (p2.n_sp, p2.n_ldpc, p2.sum_it, p2.sum_it2, p2.min_it, p2.max_it)
