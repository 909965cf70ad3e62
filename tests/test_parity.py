"""Statistical FER/iteration parity vs the measured reference baseline.

A fast two-point subset of the full sweep (tests/parity_sweep.py runs all
15 points; PARITY.md records a 1000-trial TPU run).  Skipped when the
reference data is not mounted.
"""

import os

import jax
import pytest

from qkd_ldpc_tpu.decoder.bp import DecodeOptions
from qkd_ldpc_tpu.sim.runner import run_point
from tests import fixtures

pytestmark = pytest.mark.skipif(
    not os.path.exists(fixtures.REFERENCE_ALIST), reason="reference data absent"
)

OPTS = DecodeOptions(max_iterations=100, clip_messages=True, message_threshold=100.0)


@pytest.fixture(scope="module")
def ref_code():
    from qkd_ldpc_tpu.codes import read_alist

    return read_alist(fixtures.REFERENCE_ALIST)


def test_plateau_point_qber05(ref_code):
    """QBER 0.05: reference FER 0.00, mean iterations 6.47 +- MC noise."""
    key = jax.random.fold_in(jax.random.PRNGKey(777), 4)
    p, aq = run_point(ref_code, key, 0.05, trials=100, batch=100, opts=OPTS)
    assert aq == pytest.approx(512 / 10240)
    assert p.n_sp == 100 and p.n_ldpc == 100  # FER 0.00
    mean = p.sum_it / p.n_sp
    assert 5.8 <= mean <= 7.2  # ref 6.47
    assert p.min_it >= 4 and p.max_it <= 12  # ref range 5-9


def test_waterfall_point_qber09(ref_code):
    """QBER 0.09: reference FER 0.99 — deep in the waterfall."""
    key = jax.random.fold_in(jax.random.PRNGKey(777), 11)
    p, _ = run_point(ref_code, key, 0.09, trials=50, batch=50, opts=OPTS)
    assert p.n_sp <= 5  # FER ~0.99
