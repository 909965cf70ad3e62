"""Continuation batching vs the plain runner: BIT-IDENTICAL statistics.

The continuation runner (sim.continuation) refills converged lanes with
fresh trials mid-batch; the determinism contract requires every trial's
trajectory and the banked statistics to be exactly those of the plain
runner, for any (batch, segment, refill) configuration.
"""

import jax
import pytest

from qkd_ldpc_tpu.codes import make_code
from qkd_ldpc_tpu.decoder import DecodeOptions
from qkd_ldpc_tpu.sim.continuation import run_point_continuation
from qkd_ldpc_tpu.sim.runner import run_point


@pytest.fixture(scope="module")
def wf_code():
    # R~0.49 code small enough for CPU; QBER 0.07-0.08 sits in its
    # waterfall at a 30-iteration cap, so trials both converge and fail.
    return make_code(n=1024, m=523, dv=3, seed=3, name="wf-1024")


def _assert_equal(p1, p2):
    assert (p1.n_trials, p1.n_sp, p1.n_ldpc, p1.sum_it, p1.sum_it2,
            p1.min_it, p1.max_it) == \
           (p2.n_trials, p2.n_sp, p2.n_ldpc, p2.sum_it, p2.sum_it2,
            p2.min_it, p2.max_it), (p1, p2)


@pytest.mark.parametrize("qber,max_it", [(0.075, 30), (0.03, 40)])
def test_continuation_matches_plain_runner(wf_code, qber, max_it):
    """Mixed converging/failing trials, multiple refill generations per
    lane (trials >> batch), ragged tail (trials not a batch multiple)."""
    opts = DecodeOptions(max_iterations=max_it)
    key = jax.random.fold_in(jax.random.PRNGKey(777), 5)
    p1, q1 = run_point(wf_code, key, qber, trials=70, batch=70, opts=opts)
    p2, q2 = run_point_continuation(
        wf_code, key, qber, trials=70, batch=16, opts=opts,
        segment=3, refill_frac=0.25,
    )
    assert q1 == q2
    _assert_equal(p1, p2)
    assert p2.n_trials == 70


def test_continuation_fresh_lane_clip_semantics(wf_code):
    """Tight message threshold (< |a-priori LLR|): a refilled lane's first
    check update must see the UNCLIPPED a-priori LLRs, exactly like the
    peeled first iteration of the plain decoder (reference never clips
    the initial messages, qkd_ldpc_algorithm.cpp:10-18)."""
    # threshold 3.0 < |llr| = log(0.98/0.02) = 3.89: the clip bites the
    # a-priori LLRs, so a wrongly-clipped first iteration would diverge.
    opts = DecodeOptions(max_iterations=30, message_threshold=3.0)
    key = jax.random.fold_in(jax.random.PRNGKey(3), 1)
    p1, _ = run_point(wf_code, key, 0.02, trials=40, batch=40, opts=opts)
    p2, _ = run_point_continuation(
        wf_code, key, 0.02, trials=40, batch=8, opts=opts, segment=2,
    )
    assert p1.n_sp > 0  # meaningful case: trials actually converge
    _assert_equal(p1, p2)

    # and the n_sp == 0 corner (threshold 2.5 at QBER 0.05 kills
    # convergence entirely): partials still compare bit-equal.
    opts0 = DecodeOptions(max_iterations=20, message_threshold=2.5)
    p3, _ = run_point(wf_code, key, 0.05, trials=20, batch=20, opts=opts0)
    p4, _ = run_point_continuation(
        wf_code, key, 0.05, trials=20, batch=8, opts=opts0, segment=4,
    )
    assert p3.n_sp == 0
    _assert_equal(p3, p4)


@pytest.mark.parametrize("opts", [
    DecodeOptions(max_iterations=30, algorithm="min-sum"),
    DecodeOptions(max_iterations=30, message_dtype="bfloat16"),
    DecodeOptions(max_iterations=30, message_dtype="int8"),
])
def test_continuation_variants(wf_code, opts):
    key = jax.random.fold_in(jax.random.PRNGKey(9), 2)
    p1, _ = run_point(wf_code, key, 0.06, trials=30, batch=30, opts=opts)
    p2, _ = run_point_continuation(
        wf_code, key, 0.06, trials=30, batch=10, opts=opts, segment=4,
    )
    _assert_equal(p1, p2)


def test_continuation_single_generation(wf_code):
    """trials <= batch: one generation, no refill after the first."""
    opts = DecodeOptions(max_iterations=25)
    key = jax.random.fold_in(jax.random.PRNGKey(4), 0)
    p1, _ = run_point(wf_code, key, 0.05, trials=12, batch=12, opts=opts)
    p2, _ = run_point_continuation(
        wf_code, key, 0.05, trials=12, batch=32, opts=opts, segment=5,
    )
    _assert_equal(p1, p2)


def test_continuation_overflow_guard(wf_code):
    opts = DecodeOptions(max_iterations=100_000)
    with pytest.raises(ValueError, match="overflows the int32"):
        run_point_continuation(
            wf_code, jax.random.PRNGKey(0), 0.05, trials=1000, batch=8,
            opts=opts,
        )


def test_continuation_randomized_config_fuzz(wf_code):
    """Randomized (trials, batch, segment, refill, qber, algorithm, dtype)
    configurations must all reproduce the plain runner's statistics
    exactly — the continuation machinery has no tunable that may change
    results."""
    import numpy as np

    rng = np.random.default_rng(20260816)
    for trial in range(6):
        trials = int(rng.integers(5, 60))
        batch = int(rng.integers(4, 24))
        segment = int(rng.integers(1, 7))
        refill_frac = float(rng.uniform(0.1, 0.9))
        qber = float(rng.choice([0.02, 0.05, 0.075]))
        opts = DecodeOptions(
            max_iterations=int(rng.integers(5, 35)),
            algorithm=str(rng.choice(["sum-product", "min-sum"])),
            message_dtype=str(rng.choice(["float32", "bfloat16"])),
        )
        key = jax.random.fold_in(jax.random.PRNGKey(99), trial)
        p1, _ = run_point(wf_code, key, qber, trials=trials, batch=trials,
                          opts=opts)
        p2, _ = run_point_continuation(
            wf_code, key, qber, trials=trials, batch=batch, opts=opts,
            segment=segment, refill_frac=refill_frac,
        )
        assert p1 == p2, (trials, batch, segment, refill_frac, qber, opts)


# ---------------------------------------------------------------------------
# Continuation x mesh composition (round 3): per-device lane pools over
# disjoint global trial-id ranges, partials merged via psum/pmin/pmax.


def test_sharded_continuation_matches_plain(wf_code):
    """8-device trial mesh: sharded continuation == plain runner ==
    single-device continuation, all seven partials bit-equal."""
    from qkd_ldpc_tpu.parallel.mesh import make_trial_mesh
    from qkd_ldpc_tpu.sim.continuation import run_point_continuation_sharded

    mesh = make_trial_mesh()
    opts = DecodeOptions(max_iterations=30)
    key = jax.random.fold_in(jax.random.PRNGKey(777), 7)
    p1, q1 = run_point(wf_code, key, 0.075, trials=70, batch=70, opts=opts)
    p2, q2 = run_point_continuation(
        wf_code, key, 0.075, trials=70, batch=16, opts=opts, segment=3,
    )
    p3, q3 = run_point_continuation_sharded(
        wf_code, key, 0.075, trials=70, batch=8, opts=opts, mesh=mesh,
        segment=3,
    )
    assert q1 == q2 == q3
    _assert_equal(p1, p2)
    _assert_equal(p1, p3)
    assert p3.n_trials == 70


def test_sharded_continuation_uneven_split(wf_code):
    """Trial count not divisible by the shard count (balanced split with
    remainder) and fewer trials than lanes on some shards."""
    from qkd_ldpc_tpu.parallel.mesh import make_trial_mesh
    from qkd_ldpc_tpu.sim.continuation import run_point_continuation_sharded

    mesh = make_trial_mesh()
    opts = DecodeOptions(max_iterations=25, message_dtype="bfloat16")
    key = jax.random.fold_in(jax.random.PRNGKey(5), 3)
    p1, _ = run_point(wf_code, key, 0.06, trials=13, batch=13, opts=opts)
    p2, _ = run_point_continuation_sharded(
        wf_code, key, 0.06, trials=13, batch=4, opts=opts, mesh=mesh,
        segment=2,
    )
    _assert_equal(p1, p2)


def test_batch_simulation_mesh_continuation_crossover(wf_code, tmp_path):
    """batch_simulation on a multi-device host with continuation_qber set:
    waterfall points route through SHARDED continuation and the CSV rows
    are identical to the plain mesh path (the round-2 note that
    continuation was single-device is gone)."""
    import dataclasses as dc

    from qkd_ldpc_tpu.config import Config
    from qkd_ldpc_tpu.sim.runner import SimInput, batch_simulation

    base = Config(
        threads_number=1, trials_number=24, simulation_seed=11,
        sum_product_max_iterations=25,
        r_qber_parameters=(),
        checkpoint_dir="", use_mesh=True,
    )
    si = [SimInput(code=wf_code, matrix_filename="wf.txt",
                   qber=[0.03, 0.075])]
    res_plain = batch_simulation(
        si, dc.replace(base, continuation_qber=0.0), progress=False
    )
    res_cont = batch_simulation(
        si, dc.replace(base, continuation_qber=0.07), progress=False
    )
    assert len(res_plain) == len(res_cont) == 2
    for a, b in zip(res_plain, res_cont):
        assert a == b, (a, b)


def test_cross_point_sweep_matches_plain(wf_code):
    """Round 3 cross-point continuation: several waterfall points run as
    ONE program (drained lanes of point p host point p+1's trials);
    every point's partials must equal the plain runner's bit-for-bit."""
    from qkd_ldpc_tpu.sim.continuation import dispatch_sweep_continuation
    from qkd_ldpc_tpu.sim.stats import PointPartials, partials_from_stacked

    opts = DecodeOptions(max_iterations=30)
    master = jax.random.PRNGKey(777)
    qbers = [0.07, 0.075, 0.078]
    keys = [jax.random.fold_in(master, i) for i in range(len(qbers))]

    futs, actuals = dispatch_sweep_continuation(
        wf_code, keys, qbers, trials=50, batch=16, opts=opts, segment=3,
    )
    for key, qber, fut, aq in zip(keys, qbers, futs, actuals):
        p_ref, q_ref = run_point(wf_code, key, qber, trials=50, batch=50,
                                 opts=opts)
        p = PointPartials().merge(partials_from_stacked(fut[0].fetch()))
        assert aq == q_ref
        _assert_equal(p, p_ref)
        assert p.n_trials == 50


def test_cross_point_sweep_sharded_matches_plain(wf_code):
    """Cross-point continuation x trial mesh: per-device lane pools over
    per-point id ranges, all points in one program."""
    from qkd_ldpc_tpu.parallel.mesh import make_trial_mesh
    from qkd_ldpc_tpu.sim.continuation import dispatch_sweep_continuation
    from qkd_ldpc_tpu.sim.stats import PointPartials, partials_from_stacked

    opts = DecodeOptions(max_iterations=25, message_dtype="bfloat16")
    master = jax.random.PRNGKey(5)
    qbers = [0.06, 0.075]
    keys = [jax.random.fold_in(master, i) for i in range(len(qbers))]
    futs, actuals = dispatch_sweep_continuation(
        wf_code, keys, qbers, trials=30, batch=4, opts=opts,
        mesh=make_trial_mesh(), segment=2,
    )
    for key, qber, fut in zip(keys, qbers, futs):
        p_ref, _ = run_point(wf_code, key, qber, trials=30, batch=30,
                             opts=opts)
        p = PointPartials().merge(partials_from_stacked(fut[0].fetch()))
        _assert_equal(p, p_ref)


def test_batch_simulation_groups_continuation_points(wf_code):
    """batch_simulation with several waterfall points produces identical
    CSV rows whether continuation grouping is on or off."""
    import dataclasses as dc

    from qkd_ldpc_tpu.config import Config
    from qkd_ldpc_tpu.sim.runner import SimInput, batch_simulation

    base = Config(
        threads_number=1, trials_number=20, simulation_seed=3,
        sum_product_max_iterations=25, r_qber_parameters=(),
        checkpoint_dir="", use_mesh=False,
    )
    si = [SimInput(code=wf_code, matrix_filename="wf.txt",
                   qber=[0.03, 0.072, 0.076, 0.08])]
    res_plain = batch_simulation(
        si, dc.replace(base, continuation_qber=0.0), progress=False
    )
    res_cont = batch_simulation(
        si, dc.replace(base, continuation_qber=0.07), progress=False
    )
    assert len(res_plain) == len(res_cont) == 4
    for a, b in zip(res_plain, res_cont):
        assert a == b, (a, b)


def test_cross_point_randomized_fuzz(wf_code):
    """Randomized (point count, qbers, trials, batch, segment, dtype)
    cross-point configurations must reproduce the plain runner's
    per-point statistics exactly — the cross-point machinery has no
    tunable that may change results."""
    import numpy as np

    from qkd_ldpc_tpu.sim.continuation import dispatch_sweep_continuation
    from qkd_ldpc_tpu.sim.stats import PointPartials, partials_from_stacked

    rng = np.random.default_rng(20260817)
    for trial in range(4):
        n_pts = int(rng.integers(2, 5))
        qbers = sorted(
            float(rng.choice([0.02, 0.05, 0.07, 0.075, 0.078]))
            for _ in range(n_pts)
        )
        trials = int(rng.integers(8, 50))
        batch = int(rng.integers(4, 20))
        segment = int(rng.integers(1, 6))
        opts = DecodeOptions(
            max_iterations=int(rng.integers(8, 30)),
            message_dtype=str(rng.choice(["float32", "bfloat16"])),
        )
        master = jax.random.PRNGKey(int(rng.integers(0, 1 << 30)))
        keys = [jax.random.fold_in(master, i) for i in range(n_pts)]
        futs, _ = dispatch_sweep_continuation(
            wf_code, keys, qbers, trials, batch, opts, segment=segment,
        )
        for key, qber, fut in zip(keys, qbers, futs):
            p_ref, _ = run_point(wf_code, key, qber, trials=trials,
                                 batch=trials, opts=opts)
            p = PointPartials().merge(partials_from_stacked(fut[0].fetch()))
            assert p == p_ref, (trial, n_pts, qbers, trials, batch,
                                segment, opts)
