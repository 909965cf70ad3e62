"""Simulation-layer tests: planner, stats aggregation, runner, checkpointing."""

import dataclasses
import json
import math

import numpy as np
import pytest

from qkd_ldpc_tpu.config import Config, RQBERParams, config_from_dict
from qkd_ldpc_tpu.sim import (
    PointPartials,
    batch_simulation,
    finalize_point,
    prepare_sim_inputs,
    rate_based_qber_range,
    run_point,
    SimInput,
    decode_options_from_config,
)
from qkd_ldpc_tpu.codes import make_code, write_alist


TABLE = (
    RQBERParams(0.36, 0.12, 0.135, 0.0005),
    RQBERParams(0.58, 0.06, 0.075, 0.0005),
    RQBERParams(0.95, 0.005, 0.05, 0.0005),
)


def _cfg(**kw):
    base = dict(
        trials_number=64,
        simulation_seed=777,
        sum_product_max_iterations=100,
        r_qber_parameters=TABLE,
        batch_size=32,
    )
    base.update(kw)
    return Config(**base).validate()


def test_planner_first_matching_entry():
    # R=0.489 -> the 0.58 entry: 30 points 0.06 .. 0.0745 (end-exclusive).
    pts = rate_based_qber_range(0.489, TABLE)
    assert len(pts) == 30
    assert pts[0] == pytest.approx(0.06)
    assert pts[-1] == pytest.approx(0.0745)
    # R=0.3 -> first entry.
    assert rate_based_qber_range(0.30, TABLE)[0] == pytest.approx(0.12)
    # R above every entry -> error (reference simulation.cpp:65-68).
    with pytest.raises(ValueError):
        rate_based_qber_range(0.99, TABLE)


def test_planner_step_count_rounding():
    # round((0.135-0.12)/0.0005) = round(30.0000...) = 30 points.
    assert len(rate_based_qber_range(0.3, TABLE)) == 30


def test_partials_merge():
    a = PointPartials(n_trials=10, n_sp=8, n_ldpc=8, sum_it=40, sum_it2=180, min_it=3, max_it=7)
    b = PointPartials(n_trials=10, n_sp=0, n_ldpc=0, sum_it=0, sum_it2=0, min_it=100, max_it=0)
    m = a.merge(b)
    assert m.n_trials == 20 and m.n_sp == 8
    assert m.min_it == 3 and m.max_it == 7
    c = PointPartials(n_trials=5, n_sp=2, n_ldpc=1, sum_it=4, sum_it2=10, min_it=1, max_it=3)
    m2 = a.merge(c)
    assert m2.min_it == 1 and m2.max_it == 7 and m2.n_ldpc == 9


def test_finalize_matches_reference_semantics():
    # 3 successful trials with iterations 4, 5, 7 out of 5 trials.
    it = np.array([4, 5, 7])
    p = PointPartials(
        n_trials=5, n_sp=3, n_ldpc=2,
        sum_it=float(it.sum()), sum_it2=float((it**2).sum()),
        min_it=4, max_it=7,
    )
    r = finalize_point(
        p, sim_number=0, matrix_filename="m", is_regular=False,
        num_bit_nodes=10, num_check_nodes=5, initial_qber=0.1,
        max_iterations=100,
    )
    assert r.iterations_successful_sp_mean == pytest.approx(it.mean())
    # population std-dev (÷n), reference simulation.cpp:282-295
    assert r.iterations_successful_sp_std_dev == pytest.approx(it.std())
    assert r.iterations_successful_sp_min == 4
    assert r.iterations_successful_sp_max == 7
    assert r.ratio_trials_successful_sp == pytest.approx(0.6)
    assert r.ratio_trials_successful_ldpc == pytest.approx(0.4)
    assert r.fer == pytest.approx(0.6)
    assert r.code_rate == pytest.approx(0.5)


def test_finalize_no_success_and_min_quirk():
    # No successful trials: everything reports 0.
    p = PointPartials(n_trials=5, n_sp=0, min_it=100, max_it=0)
    r = finalize_point(
        p, sim_number=0, matrix_filename="m", is_regular=True,
        num_bit_nodes=10, num_check_nodes=5, initial_qber=0.1,
        max_iterations=100,
    )
    assert r.iterations_successful_sp_min == 0
    assert r.iterations_successful_sp_max == 0
    assert r.fer == 1.0
    # Reference quirk (simulation.cpp:306): a success taking exactly
    # max_iterations leaves min at its initializer -> reported as 0.
    p2 = PointPartials(n_trials=2, n_sp=1, n_ldpc=1, sum_it=100, sum_it2=10000,
                       min_it=100, max_it=100)
    r2 = finalize_point(
        p2, sim_number=0, matrix_filename="m", is_regular=True,
        num_bit_nodes=10, num_check_nodes=5, initial_qber=0.1,
        max_iterations=100,
    )
    assert r2.iterations_successful_sp_min == 0
    assert r2.iterations_successful_sp_max == 100


def test_run_point_batch_invariance(medium_code):
    """Partial sums must not depend on how trials are chunked into batches."""
    import jax

    opts = decode_options_from_config(_cfg())
    key = jax.random.fold_in(jax.random.PRNGKey(777), 0)
    p1, q1 = run_point(medium_code, key, 0.03, trials=48, batch=48, opts=opts)
    p2, q2 = run_point(medium_code, key, 0.03, trials=48, batch=16, opts=opts)
    p3, _ = run_point(medium_code, key, 0.03, trials=48, batch=20, opts=opts)  # ragged tail
    assert q1 == q2
    for a, b in ((p1, p2), (p1, p3)):
        assert a.n_trials == b.n_trials == 48
        assert a.n_sp == b.n_sp and a.n_ldpc == b.n_ldpc
        assert a.sum_it == b.sum_it and a.sum_it2 == b.sum_it2
        assert a.min_it == b.min_it and a.max_it == b.max_it


def test_run_point_too_small_key(johnson_code):
    import jax

    opts = decode_options_from_config(_cfg())
    with pytest.raises(ValueError, match="too small for QBER"):
        run_point(johnson_code, jax.random.PRNGKey(0), 0.05, 8, 8, opts)


def test_batch_simulation_and_checkpoint(tmp_path, medium_code):
    cfg = _cfg(trials_number=32, checkpoint_dir=str(tmp_path / "ckpt"))
    si = SimInput(code=medium_code, matrix_filename="n512", qber=[0.03, 0.04])
    results = batch_simulation([si], cfg, progress=False)
    assert len(results) == 2
    assert all(r.ratio_trials_successful_ldpc > 0.9 for r in results)
    assert results[0].sim_number == 0 and results[1].sim_number == 1
    assert results[0].initial_qber == pytest.approx(int(512 * 0.03) / 512)

    # Checkpoint file has both points; a re-run must reuse them verbatim.
    ckpt_files = list((tmp_path / "ckpt").iterdir())
    assert len(ckpt_files) == 1
    recs = [json.loads(l) for l in ckpt_files[0].read_text().splitlines()]
    assert len(recs) == 2

    results2 = batch_simulation([si], cfg, progress=False)
    assert [dataclasses.asdict(r) for r in results2] == [
        dataclasses.asdict(r) for r in results
    ]


def test_prepare_sim_inputs(tmp_path):
    code = make_code(n=128, m=65, dv=3, seed=0)
    write_alist(code, tmp_path / "c128.txt")
    cfg = _cfg()
    inputs = prepare_sim_inputs([tmp_path / "c128.txt"], cfg)
    assert len(inputs) == 1
    assert inputs[0].matrix_filename == "c128.txt"
    # R = 1 - 65/128 = 0.492 -> 0.58 table entry.
    assert inputs[0].qber[0] == pytest.approx(0.06)
