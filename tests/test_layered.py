"""Layered (serial check-layered) schedule vs flooding (round 4).

The layered schedule is a NEW trajectory family (no reference-parity
claim — the reference is flooding-only, src/qkd_ldpc_algorithm.cpp:40-158);
the validation bar is statistical: it must decode to Alice's key
wherever flooding does on the fixtures, in no more (in practice ~half)
iterations, with equal-or-better convergence counts near the waterfall
(decoder/layered.py; hardware timing in benchmarks/layered.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
from qkd_ldpc_tpu.codes import make_code, make_qc_code
from qkd_ldpc_tpu.decoder import DecodeOptions, decode
from qkd_ldpc_tpu.decoder.reconcile import apriori_llr
from qkd_ldpc_tpu.decoder.syndrome import syndrome


@pytest.fixture(scope="module")
def qc_code():
    return make_qc_code(z=32, nb=10, mb=5, dv=3, seed=7)  # N=320, R=0.5


def _fixture(code, qber, batch, seed):
    n_err = num_errors_for(code.n_vars, qber)
    alice, bob = make_trial_batch(
        jax.random.PRNGKey(seed), code.n_vars, batch,
        jnp.asarray(n_err, jnp.int32),
    )
    llr = apriori_llr(bob, n_err / code.n_vars)
    syn = syndrome(code, alice)
    return alice, llr, syn


@pytest.mark.parametrize("alg", ["sum-product", "min-sum"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_layered_decodes_to_alice(qc_code, alg, dtype):
    """Every frame flooding decodes, layered decodes too (to the SAME
    key — Alice's), at this comfortably-decodable point."""
    alice, llr, syn = _fixture(qc_code, 0.04, batch=48, seed=0)
    base = DecodeOptions(algorithm=alg, message_dtype=dtype,
                         max_iterations=60)
    fl = decode(qc_code, llr, syn, base)
    la = decode(qc_code, llr, syn,
                dataclasses.replace(base, schedule="layered"))
    assert bool(jnp.all(fl.syndromes_match)) and bool(
        jnp.all(la.syndromes_match))
    np.testing.assert_array_equal(np.asarray(la.bits), np.asarray(alice))


def test_layered_halves_iterations(qc_code):
    """The reason the schedule exists: mean sweeps well below flooding's
    mean iterations at the same point (literature: ~2x; assert >=1.3x
    to stay robust to fixture noise)."""
    _, llr, syn = _fixture(qc_code, 0.05, batch=96, seed=1)
    opts = DecodeOptions(max_iterations=100)
    fl = decode(qc_code, llr, syn, opts)
    la = decode(qc_code, llr, syn,
                dataclasses.replace(opts, schedule="layered"))
    mi_f = float(jnp.mean(fl.iterations[fl.syndromes_match]))
    mi_l = float(jnp.mean(la.iterations[la.syndromes_match]))
    assert mi_l * 1.3 < mi_f, (mi_l, mi_f)


def test_layered_waterfall_not_worse(qc_code):
    """Near the waterfall the layered schedule must converge at least
    as many frames as flooding within the same iteration cap (layered
    converging MORE is the expected direction)."""
    _, llr, syn = _fixture(qc_code, 0.075, batch=192, seed=2)
    opts = DecodeOptions(max_iterations=100)
    fl = decode(qc_code, llr, syn, opts)
    la = decode(qc_code, llr, syn,
                dataclasses.replace(opts, schedule="layered"))
    assert int(la.syndromes_match.sum()) >= int(fl.syndromes_match.sum())


def test_layered_failure_reports_max_iterations(qc_code):
    """Reference convention (qkd_ldpc_algorithm.cpp:172): frames that
    never converge report max_iterations and ok=False."""
    _, llr, syn = _fixture(qc_code, 0.11, batch=64, seed=3)
    la = decode(qc_code, llr, syn,
                DecodeOptions(max_iterations=8, schedule="layered"))
    failed = ~np.asarray(la.syndromes_match)
    assert failed.any()
    assert (np.asarray(la.iterations)[failed] == 8).all()


def test_layered_requires_qc(qc_code):
    code = make_code(n=256, m=128, dv=3, seed=4)
    _, llr, syn = _fixture(code, 0.03, batch=4, seed=4)
    with pytest.raises(ValueError, match="QC"):
        decode(code, llr, syn,
               DecodeOptions(max_iterations=5, schedule="layered"))


def test_layered_runner_statistics(qc_code):
    """run_point with schedule='layered' produces well-formed partials
    (nested LDPC <= SP counts, iteration moments consistent)."""
    from qkd_ldpc_tpu.sim.runner import run_point

    opts = DecodeOptions(max_iterations=60, schedule="layered")
    key = jax.random.fold_in(jax.random.PRNGKey(777), 0)
    p, aq = run_point(qc_code, key, 0.04, trials=40, batch=40, opts=opts)
    assert p.n_trials == 40 and 0 < p.n_sp <= 40
    assert 0 <= p.n_ldpc <= p.n_sp
    assert p.min_it >= 1 and p.max_it <= 60 and p.sum_it >= p.n_sp


def test_layered_config_roundtrip(tmp_path):
    """Config knob parses, threads into DecodeOptions, and is
    result-determining in the checkpoint fingerprint."""
    import json

    from qkd_ldpc_tpu.config import config_from_dict
    from qkd_ldpc_tpu.sim.runner import decode_options_from_config

    base = dict(
        trials_number=10,
        simulation_seed=7,
        sum_product_max_iterations=30,
        code_rate_QBER_parameters=[dict(code_rate=0.6, QBER_begin=0.03,
                                        QBER_end=0.05, QBER_step=0.01)],
    )
    cfg = config_from_dict(dict(base, schedule="layered"))
    assert decode_options_from_config(cfg).schedule == "layered"
    with pytest.raises(ValueError, match="schedule"):
        config_from_dict(dict(base, schedule="zigzag"))
    with pytest.raises(ValueError, match="continuation"):
        config_from_dict(dict(base, schedule="layered",
                              continuation_qber=0.08))


@pytest.mark.parametrize("alg", ["sum-product", "min-sum"])
@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_layered_compaction_bit_identical(qc_code, alg, dtype):
    """Residency compaction composes with the layered schedule as a
    SCHEDULE change only (decoder/layered.py phase A/B/C): for every
    lane — converged in phase A, finished compacted in phase B, or
    overflowed into the frozen full-batch fallback phase C — decisions,
    sweep counts, and convergence flags equal the plain layered loop's."""
    B = 32
    # Layered converges in ~half the flooding sweeps, so the compaction
    # point is earlier.  The 0.10 x 4-lane case forces the overflow
    # fallback; 0.02 converges almost entirely inside phase A; 0.05
    # exercises the intended phase-B schedule.
    cases = [(0.02, 2, 8), (0.05, 2, 8), (0.10, 2, 4)]
    for qber, k1, b2 in cases:
        _, llr, syn = _fixture(qc_code, qber, batch=B,
                               seed=hash((alg, dtype, qber)) % (2**31))
        base = dict(max_iterations=40, algorithm=alg, message_dtype=dtype,
                    schedule="layered")
        plain = decode(qc_code, llr, syn, DecodeOptions(**base))
        comp = decode(
            qc_code, llr, syn,
            DecodeOptions(**base, compact_after=k1, compact_lanes=b2),
        )
        np.testing.assert_array_equal(
            np.asarray(plain.bits), np.asarray(comp.bits),
            err_msg=f"{alg}/{dtype} qber={qber}",
        )
        np.testing.assert_array_equal(
            np.asarray(plain.iterations), np.asarray(comp.iterations),
            err_msg=f"{alg}/{dtype} qber={qber}",
        )
        np.testing.assert_array_equal(
            np.asarray(plain.syndromes_match),
            np.asarray(comp.syndromes_match),
        )


def test_layered_sharded_matches_single_device(qc_code):
    """Trial-mesh sharding with schedule='layered' (+ compaction) is
    bit-identical to the single-device runner — the determinism
    contract extends to the new schedule (cf. tests/test_sharding.py)."""
    from qkd_ldpc_tpu.parallel import make_trial_mesh, run_point_sharded
    from qkd_ldpc_tpu.sim.runner import run_point

    key = jax.random.fold_in(jax.random.PRNGKey(909), 0)
    opts = DecodeOptions(max_iterations=60, schedule="layered",
                         compact_after=2, compact_lanes=2)
    p1, q1 = run_point(qc_code, key, 0.05, trials=64, batch=64, opts=opts)
    p2, q2 = run_point_sharded(qc_code, key, 0.05, trials=64, batch=64,
                               opts=opts, mesh=make_trial_mesh())
    assert q1 == q2
    for f in ("n_trials", "n_sp", "n_ldpc", "sum_it", "sum_it2",
              "min_it", "max_it"):
        assert getattr(p1, f) == getattr(p2, f), f


def test_layered_fixed_seed_pin(qc_code):
    """Fixed-seed iteration pin (like tests/test_regression.py): catches
    unintended numeric drift in the layered update order.  Re-pin ONLY
    with an intentional numerics change + a fresh parity run."""
    _, llr, syn = _fixture(qc_code, 0.05, batch=8, seed=42)
    la = decode(qc_code, llr, syn,
                DecodeOptions(max_iterations=100, schedule="layered"))
    assert bool(jnp.all(la.syndromes_match))
    pin = np.asarray(la.iterations).tolist()
    # computed once on the CPU backend at commit time
    assert pin == _LAYERED_PIN, pin


_LAYERED_PIN = [2, 3, 3, 4, 2, 3, 2, 2]
