"""Console tracing (the reference's TRACE_* flags, SURVEY.md §5)."""

import numpy as np
import pytest

from qkd_ldpc_tpu.config import Config, RQBERParams
from qkd_ldpc_tpu.sim.tracing import ConsoleTracer, TraceFlags, traced_reconcile
from tests import fixtures


def _johnson_trace(flags):
    from qkd_ldpc_tpu.codes import from_dense

    code = from_dense(np.array(fixtures.H_JOHNSON), name="johnson")
    lines = []
    res, keys_match = traced_reconcile(
        code,
        np.array(fixtures.JOHNSON_ALICE),
        np.array(fixtures.JOHNSON_BOB),
        fixtures.JOHNSON_QBER,
        flags=flags,
        print_fn=lines.append,
    )
    return res, keys_match, "\n".join(lines)


def test_full_trace_contains_all_levels():
    res, keys_match, out = _johnson_trace(TraceFlags(True, True, True))
    assert keys_match and res.syndromes_match
    # protocol level (TRACE_QKD_LDPC)
    assert "a priori log likelihood ratios (r)" in out
    assert "Alice syndrome" in out
    assert "Corrected bit array" in out
    # iteration level (TRACE_SUM_PRODUCT)
    assert "Iteration: 1" in out
    assert "check-to-bit messages (E)" in out
    assert "total log likelihood ratios (L)" in out
    assert "bit decisions (z)" in out
    assert "Decision syndrome (s)" in out
    # LLR level (TRACE_SUM_PRODUCT_LLR)
    assert "MAX ABS LLR" in out


def test_trace_levels_gate_independently():
    _, _, out = _johnson_trace(TraceFlags(qkd_ldpc=True))
    assert "Alice syndrome" in out and "Iteration:" not in out
    assert "MAX ABS LLR" not in out

    _, _, out = _johnson_trace(TraceFlags(sum_product=True))
    assert "Iteration: 1" in out and "Alice syndrome" not in out

    _, _, out = _johnson_trace(TraceFlags(sum_product_llr=True))
    assert "MAX ABS LLR" in out and "bit decisions" not in out

    _, _, out = _johnson_trace(TraceFlags())
    assert out == ""


def test_flags_from_config():
    cfg = Config(
        trace_qkd_ldpc=True,
        trace_sum_product=False,
        trace_sum_product_llr=True,
        r_qber_parameters=(RQBERParams(0.5, 0.01, 0.02, 0.005),),
    ).validate()
    f = TraceFlags.from_config(cfg)
    assert f.qkd_ldpc and not f.sum_product and f.sum_product_llr and f.any


def test_interactive_mode_traces(tmp_path, n10_code):
    """Interactive mode with trace flags routes through the traced oracle."""
    from qkd_ldpc_tpu.codes import write_dense
    from qkd_ldpc_tpu.sim import interactive_simulation

    write_dense(n10_code, tmp_path / "n10.txt")
    cfg = Config(
        trials_number=1,
        simulation_seed=3,
        use_dense_matrices=True,
        trace_qkd_ldpc=True,
        trace_sum_product=True,
        r_qber_parameters=(RQBERParams(0.9, 0.1, 0.3, 0.1),),
    ).validate()
    lines = []
    interactive_simulation(
        cfg, tmp_path, input_fn=lambda _: "1", print_fn=lines.append
    )
    out = "\n".join(lines)
    assert "Iteration: 1" in out
    assert "Error reconciliation" in out


def test_example_program_runs(capsys):
    import importlib.util, pathlib

    path = pathlib.Path(__file__).parent.parent / "examples" / "qkd_ldpc_example.py"
    spec = importlib.util.spec_from_file_location("qkd_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    assert "Recovered Alice's key" in out
    assert "MAX ABS LLR" in out


def test_secure_chain_example_runs(capsys):
    import importlib.util
    import pathlib

    path = (pathlib.Path(__file__).parent.parent / "examples"
            / "secure_chain_example.py")
    spec = importlib.util.spec_from_file_location("secure_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    assert "amplified keys are IDENTICAL" in out
    assert "reconciled blind" in out
