"""Sharded-sweep tests on a virtual 8-device CPU mesh.

This is the TPU-world answer to "test multi-node without a cluster"
(SURVEY.md §4): ``xla_force_host_platform_device_count=8`` fakes 8 devices
(set in conftest.py before jax import).
"""

import jax
import numpy as np
import pytest

from qkd_ldpc_tpu.decoder import DecodeOptions
from qkd_ldpc_tpu.parallel import (
    TRIAL_AXIS,
    make_mesh,
    make_trial_mesh,
    run_point_sharded,
)
from qkd_ldpc_tpu.sim.runner import run_point

OPTS = DecodeOptions()


def test_virtual_devices_present():
    assert jax.device_count() == 8


def test_trial_mesh_shape():
    mesh = make_trial_mesh()
    assert mesh.shape[TRIAL_AXIS] == 8
    mesh2 = make_mesh(n_trial=4, n_node=2)
    assert mesh2.shape == {"trial": 4, "node": 2}
    with pytest.raises(ValueError):
        make_mesh(n_node=3)


def test_sharded_point_matches_single_device(medium_code):
    """Sharding over 8 devices must be bit-identical to the 1-chip runner
    (the determinism contract)."""
    key = jax.random.fold_in(jax.random.PRNGKey(777), 0)
    p_single, q1 = run_point(
        medium_code, key, 0.03, trials=64, batch=64, opts=OPTS
    )
    mesh = make_trial_mesh()
    p_shard, q2 = run_point_sharded(
        medium_code, key, 0.03, trials=64, batch=64, opts=OPTS, mesh=mesh
    )
    assert q1 == q2
    assert p_single.n_trials == p_shard.n_trials == 64
    assert p_single.n_sp == p_shard.n_sp
    assert p_single.n_ldpc == p_shard.n_ldpc
    assert p_single.sum_it == p_shard.sum_it
    assert p_single.sum_it2 == p_shard.sum_it2
    assert p_single.min_it == p_shard.min_it
    assert p_single.max_it == p_shard.max_it


def test_sharded_ragged_tail(medium_code):
    """Trials not divisible by (batch x devices) still count exactly."""
    key = jax.random.fold_in(jax.random.PRNGKey(3), 1)
    mesh = make_trial_mesh()
    # 50 trials, global batch 24 (rounds to 24; shards of 3) -> 3 launches.
    p, _ = run_point_sharded(
        medium_code, key, 0.03, trials=50, batch=24, opts=OPTS, mesh=mesh
    )
    assert p.n_trials == 50
    p_ref, _ = run_point(medium_code, key, 0.03, trials=50, batch=50, opts=OPTS)
    assert p.n_sp == p_ref.n_sp and p.sum_it == p_ref.sum_it
