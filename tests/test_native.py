"""Native C++ data-loader / graph-builder vs the pure-NumPy path.

The native library (``native/qkd_ldpc_native.cpp``) is the framework's
counterpart of the reference's C++ ingest layer
(``src/array_and_matrix_operations.cpp:4-292``).  Both loaders must produce
bit-identical LDPCCode tensors — adjacency, masks, routing permutations,
degrees, regularity — on every shipped and generated code.
"""

import os

import numpy as np
import pytest

from qkd_ldpc_tpu.codes import make_code, read_alist, write_alist
from qkd_ldpc_tpu.codes._native import (
    build_graph_native,
    native_available,
    read_alist_native,
)
from tests import fixtures

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)

_FIELDS = (
    "chk_adj", "chk_mask", "var_adj", "var_mask",
    "var_slot", "chk_slot", "var_deg", "chk_deg",
)


def _assert_codes_identical(a, b):
    assert (a.n_vars, a.n_checks, a.dv_max, a.dc_max, a.n_edges) == (
        b.n_vars, b.n_checks, b.dv_max, b.dc_max, b.n_edges
    )
    assert a.is_regular == b.is_regular
    for f in _FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


@pytest.mark.parametrize("n,m,dv,seed", [(128, 66, 3, 1), (512, 262, 3, 7)])
def test_native_matches_python_roundtrip(tmp_path, n, m, dv, seed):
    code = make_code(n=n, m=m, dv=dv, seed=seed, name="c")
    p = tmp_path / "c.alist"
    write_alist(code, p)
    py = read_alist(p, native=False)
    nat = read_alist_native(p, name=p.name)
    _assert_codes_identical(py, nat)
    _assert_codes_identical(py, code)


def test_native_reads_reference_alist():
    if not os.path.exists(fixtures.REFERENCE_ALIST):
        pytest.skip("reference checkout absent")
    py = read_alist(fixtures.REFERENCE_ALIST, native=False)
    nat = read_alist_native(fixtures.REFERENCE_ALIST)
    _assert_codes_identical(py, nat)
    # the shipped production code's known profile
    assert nat.n_vars == 10240 and nat.n_checks == 5231
    assert not nat.is_regular
    hist = np.bincount(np.asarray(nat.chk_deg))
    assert hist[5] == 666 and hist[6] == 4565


def test_native_graph_builder_from_edges(n10_code):
    chk_deg = np.asarray(n10_code.chk_deg, np.int32)
    e_var = np.concatenate([
        np.asarray(n10_code.chk_adj[c, n10_code.chk_mask[c]])
        for c in range(n10_code.n_checks)
    ]).astype(np.int32)
    nat = build_graph_native(chk_deg, e_var, n10_code.n_vars, name=n10_code.name)
    _assert_codes_identical(n10_code, nat)


def test_native_error_paths(tmp_path):
    p = tmp_path / "bad.alist"
    p.write_text("2 1\n1 2\n")  # truncated
    with pytest.raises(ValueError):
        read_alist_native(p)
    p.write_text("2 1\n1 2\n1 1\n2\n1\n1\n1 3\n")  # var index out of range
    with pytest.raises(ValueError):
        read_alist_native(p)


def test_native_duplicate_edge():
    with pytest.raises(ValueError, match="Duplicate"):
        build_graph_native(
            np.array([2, 1], np.int32), np.array([0, 0, 1], np.int32), n_vars=2
        )


def test_read_alist_native_default(tmp_path):
    """read_alist's default path (native=None) uses the native loader and
    agrees with the forced-Python path."""
    code = make_code(n=64, m=33, dv=3, seed=4, name="c")
    p = tmp_path / "c.alist"
    write_alist(code, p)
    _assert_codes_identical(read_alist(p), read_alist(p, native=False))


def test_native_column_row_cross_validation(tmp_path):
    """Column block inconsistent with the row block must be rejected by
    BOTH loaders (validation parity)."""
    from qkd_ldpc_tpu.codes.alist import parse_alist

    # 2 vars, 2 checks; row block says check1={v1,v2}, check2={v1,v2};
    # column block claims v1={1,2}, v2={1,1}<-wrong (right counts, wrong set)
    bad = "2 2\n2 2\n2 2\n2 2\n1 2\n1 1\n1 2\n1 2\n"
    with pytest.raises(ValueError, match="isagrees with row adjacency"):
        parse_alist(bad)
    p = tmp_path / "bad.alist"
    p.write_text(bad)
    with pytest.raises(ValueError, match="isagrees with row adjacency"):
        read_alist_native(p)


def test_from_check_adjacency_native_path_identical(n10_code):
    """from_check_adjacency's native route (forced) matches the NumPy path."""
    from qkd_ldpc_tpu.codes.ldpc_code import from_check_adjacency

    neighbors = [
        np.asarray(n10_code.chk_adj[c, n10_code.chk_mask[c]])
        for c in range(n10_code.n_checks)
    ]
    a = from_check_adjacency(neighbors, n10_code.n_vars, native=False)
    b = from_check_adjacency(neighbors, n10_code.n_vars, native=True)
    _assert_codes_identical(a, b)
