"""Fused Pallas layered-sweep kernel vs the XLA layered loop (round 5).

The kernel (decoder/pallas_layered) claims BIT-IDENTITY to the XLA
layered schedule — same op order, storage round-trips, clip placement,
gating and syndrome convention — for every algorithm x message dtype,
including residency compaction and ragged batch widths.  These tests
pin that claim in interpret mode on CPU (the hardware lowering is the
same program; benchmarks/layered.md carries the timing evidence).
The reference has no layered schedule (flooding only,
src/qkd_ldpc_algorithm.cpp:40-158); the XLA loop's own statistics are
validated in tests/test_layered.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
from qkd_ldpc_tpu.codes import make_qc_code
from qkd_ldpc_tpu.decoder import DecodeOptions, decode


@pytest.fixture(scope="module")
def qc_code():
    return make_qc_code(z=32, nb=10, mb=5, dv=3, seed=7)  # N=320, R=0.5


def _fixture(code, qber, batch, seed):
    n_err = num_errors_for(code.n_vars, qber)
    alice, bob = make_trial_batch(
        jax.random.PRNGKey(seed), code.n_vars, batch,
        jnp.asarray(n_err, jnp.int32),
    )
    from qkd_ldpc_tpu.decoder.reconcile import apriori_llr
    from qkd_ldpc_tpu.decoder.syndrome import syndrome

    llr = apriori_llr(bob, n_err / code.n_vars)
    syn = syndrome(code, alice)
    return alice, llr, syn


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
    np.testing.assert_array_equal(
        np.asarray(a.iterations), np.asarray(b.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(a.syndromes_match), np.asarray(b.syndromes_match)
    )


@pytest.mark.parametrize("alg", ["sum-product", "min-sum"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_pallas_layered_bit_identical(qc_code, alg, dtype):
    """Kernel sweep == XLA sweep, per lane, for every algorithm/dtype."""
    _, llr, syn = _fixture(qc_code, 0.06, batch=48, seed=3)
    base = DecodeOptions(algorithm=alg, message_dtype=dtype,
                         max_iterations=60, schedule="layered")
    xla = decode(qc_code, llr, syn, dataclasses.replace(base, backend="xla"))
    pal = decode(qc_code, llr, syn,
                 dataclasses.replace(base, backend="pallas"))
    _assert_same(xla, pal)


def test_pallas_layered_bit_identical_minsum_beta(qc_code):
    """Offset min-sum (beta) path through the kernel."""
    _, llr, syn = _fixture(qc_code, 0.05, batch=32, seed=4)
    base = DecodeOptions(algorithm="min-sum", min_sum_beta=0.15,
                         max_iterations=50, schedule="layered")
    xla = decode(qc_code, llr, syn, dataclasses.replace(base, backend="xla"))
    pal = decode(qc_code, llr, syn,
                 dataclasses.replace(base, backend="pallas"))
    _assert_same(xla, pal)


def test_pallas_layered_no_clip(qc_code):
    """clip_messages=False removes every clip site in both lowerings."""
    _, llr, syn = _fixture(qc_code, 0.05, batch=32, seed=5)
    base = DecodeOptions(clip_messages=False, max_iterations=50,
                         schedule="layered")
    xla = decode(qc_code, llr, syn, dataclasses.replace(base, backend="xla"))
    pal = decode(qc_code, llr, syn,
                 dataclasses.replace(base, backend="pallas"))
    _assert_same(xla, pal)


def test_pallas_layered_ragged_batch(qc_code):
    """B not a multiple of the batch tile: padded lanes must be inert
    and the real lanes bit-identical."""
    _, llr, syn = _fixture(qc_code, 0.06, batch=37, seed=6)
    base = DecodeOptions(max_iterations=60, schedule="layered")
    xla = decode(qc_code, llr, syn, dataclasses.replace(base, backend="xla"))
    pal = decode(qc_code, llr, syn,
                 dataclasses.replace(base, backend="pallas"))
    _assert_same(xla, pal)


def test_pallas_layered_compaction_bit_identical(qc_code):
    """Residency compaction through the kernel path: phase A/B/C with
    tile-rounded compacted width changes the schedule, never any lane's
    result."""
    _, llr, syn = _fixture(qc_code, 0.075, batch=96, seed=7)
    base = DecodeOptions(max_iterations=80, schedule="layered")
    plain = decode(qc_code, llr, syn,
                   dataclasses.replace(base, backend="pallas"))
    compact = decode(
        qc_code, llr, syn,
        dataclasses.replace(base, backend="pallas", compact_after=4,
                            compact_lanes=24),
    )
    _assert_same(plain, compact)


def test_pallas_layered_z128():
    """Full-lane-tile shape (z % 128 == 0) — the hardware-eligible
    geometry — stays bit-identical to the XLA loop."""
    code = make_qc_code(z=128, nb=6, mb=3, dv=3, seed=11)  # N=768
    _, llr, syn = _fixture(code, 0.05, batch=16, seed=8)
    base = DecodeOptions(max_iterations=50, schedule="layered",
                         message_dtype="bfloat16")
    xla = decode(code, llr, syn, dataclasses.replace(base, backend="xla"))
    pal = decode(code, llr, syn, dataclasses.replace(base, backend="pallas"))
    _assert_same(xla, pal)


def test_pallas_layered_decodes_to_alice(qc_code):
    """End-to-end sanity: the kernel path decodes to Alice's key."""
    alice, llr, syn = _fixture(qc_code, 0.04, batch=24, seed=9)
    res = decode(
        qc_code, llr, syn,
        DecodeOptions(max_iterations=60, schedule="layered",
                      backend="pallas"),
    )
    assert bool(jnp.all(res.syndromes_match))
    np.testing.assert_array_equal(np.asarray(res.bits), np.asarray(alice))
