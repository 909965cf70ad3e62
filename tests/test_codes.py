"""Code-ingest tests: dense/alist parsers, LDPCCode invariants, generator."""

import os

import numpy as np
import pytest

from qkd_ldpc_tpu.codes import (
    from_dense,
    make_code,
    parse_alist,
    parse_dense,
    read_alist,
    write_alist,
    write_dense,
    read_dense,
    load_code,
)
from tests import fixtures


def _assert_code_invariants(code):
    # Masked adjacency consistent with degrees.
    assert code.chk_mask.sum() == code.n_edges
    assert code.var_mask.sum() == code.n_edges
    np.testing.assert_array_equal(code.chk_mask.sum(axis=1), code.chk_deg)
    np.testing.assert_array_equal(code.var_mask.sum(axis=1), code.var_deg)

    # var_slot / chk_slot are mutually inverse bijections on the edge set:
    # routing an edge-unique labeling check-major -> var-major -> check-major
    # must be the identity.
    M, dc = code.chk_adj.shape
    N, dv = code.var_adj.shape
    labels = np.where(code.chk_mask, np.arange(M * dc).reshape(M, dc), -1).astype(
        float
    )
    flat = np.append(labels.reshape(-1), np.nan)
    var_side = flat[code.var_slot]  # [N, dv]
    assert not np.isnan(var_side[code.var_mask]).any()
    flat_v = np.append(var_side.reshape(-1), np.nan)
    back = flat_v[code.chk_slot]
    np.testing.assert_array_equal(
        back[code.chk_mask], labels[code.chk_mask]
    )

    # Edge endpoints agree between the two layouts.
    for v in range(min(N, 32)):
        for k in range(dv):
            if not code.var_mask[v, k]:
                continue
            slot = code.var_slot[v, k]
            c, j = divmod(int(slot), dc)
            assert code.chk_adj[c, j] == v
            assert code.var_adj[v, k] == c


def test_dense_johnson(johnson_code):
    code = johnson_code
    assert (code.n_vars, code.n_checks) == (6, 4)
    assert code.is_regular  # column weight 2, row weight 3
    assert code.n_edges == 12
    assert code.code_rate == pytest.approx(1 - 4 / 6)
    np.testing.assert_array_equal(code.dense, np.array(fixtures.H_JOHNSON))
    _assert_code_invariants(code)


def test_dense_irregular(n10_code):
    code = n10_code
    assert (code.n_vars, code.n_checks) == (10, 5)
    assert not code.is_regular
    np.testing.assert_array_equal(code.dense, np.array(fixtures.H_N10))
    _assert_code_invariants(code)


def test_dense_rejects_non_binary():
    with pytest.raises(ValueError, match="0 or 1"):
        parse_dense("0 1 2\n1 0 1\n")


def test_dense_rejects_ragged():
    with pytest.raises(ValueError, match="Different lengths"):
        parse_dense("0 1 1\n1 0\n")


def test_dense_rejects_zero_column():
    with pytest.raises(ValueError, match="Column"):
        parse_dense("0 1 1\n0 1 1\n")


def test_dense_rejects_zero_row():
    with pytest.raises(ValueError, match="Row|weight"):
        parse_dense("0 0 0\n1 1 1\n")


def test_alist_roundtrip(tmp_path, n10_code):
    p = tmp_path / "n10.alist"
    write_alist(n10_code, p)
    code2 = read_alist(p)
    np.testing.assert_array_equal(code2.dense, n10_code.dense)
    _assert_code_invariants(code2)


def test_dense_roundtrip(tmp_path, hamming_code):
    p = tmp_path / "h74.txt"
    write_dense(hamming_code, p)
    code2 = read_dense(p)
    np.testing.assert_array_equal(code2.dense, hamming_code.dense)


def test_load_code_autodetect(tmp_path, n10_code):
    pd = tmp_path / "dense.txt"
    pa = tmp_path / "sparse.txt"
    write_dense(n10_code, pd)
    write_alist(n10_code, pa)
    np.testing.assert_array_equal(load_code(pd).dense, n10_code.dense)
    np.testing.assert_array_equal(load_code(pa).dense, n10_code.dense)


def test_alist_validation_errors():
    with pytest.raises(ValueError, match="alist format"):
        parse_alist("1 2 3\n1 1\n1\n1 1\n")
    with pytest.raises(ValueError, match="Insufficient data"):
        parse_alist("2 1\n1 2\n")
    # weight/adjacency mismatch
    bad = "2 1\n1 2\n1 1\n2\n1\n1\n1 2\n"
    with pytest.raises(ValueError, match="non-zero elements"):
        parse_alist(bad.replace("\n1\n1\n", "\n1\n1 1\n"))


def test_generator_profile():
    code = make_code(n=1024, m=523, dv=3, seed=1)
    assert code.n_vars == 1024 and code.n_checks == 523
    np.testing.assert_array_equal(code.var_deg, np.full(1024, 3))
    # Balanced row split of E = 3072 over 523 rows: 5s and 6s only.
    assert set(code.chk_deg.tolist()) <= {5, 6}
    assert code.chk_deg.sum() == 3072
    assert not code.is_regular
    _assert_code_invariants(code)


def test_generator_matches_reference_profile():
    # Same degree-profile family as the reference's shipped production code.
    code = make_code(n=10240, m=5231, dv=3, seed=666)
    hist = dict(zip(*np.unique(code.chk_deg, return_counts=True)))
    assert hist == {5: 666, 6: 4565}


@pytest.mark.skipif(
    not os.path.exists(fixtures.REFERENCE_ALIST), reason="reference data absent"
)
def test_reference_alist_parses():
    code = read_alist(fixtures.REFERENCE_ALIST)
    assert (code.n_vars, code.n_checks) == (10240, 5231)
    assert code.n_edges == 30720
    assert not code.is_regular
    np.testing.assert_array_equal(code.var_deg, np.full(10240, 3))
    hist = dict(zip(*np.unique(code.chk_deg, return_counts=True)))
    assert hist == {5: 666, 6: 4565}
    _assert_code_invariants(code)
