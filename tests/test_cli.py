"""CLI tests: batch run end-to-end, interactive mode, code generation."""

import json

import numpy as np
import pytest

from qkd_ldpc_tpu.cli import main
from qkd_ldpc_tpu.codes import make_code, write_dense, read_alist


@pytest.fixture
def workspace(tmp_path):
    (tmp_path / "dense_matrices").mkdir()
    code = make_code(n=128, m=65, dv=3, seed=3)
    write_dense(code, tmp_path / "dense_matrices" / "c128.txt")
    cfg = {
        "threads_number": 1,
        "trials_number": 16,
        "use_config_simulation_seed": True,
        "simulation_seed": 42,
        "interactive_mode": False,
        "sum_product_max_iterations": 100,
        "use_dense_matrices": True,
        "trace_qkd_ldpc": False,
        "trace_sum_product": False,
        "trace_sum_product_llr": False,
        "enable_sum_product_msg_llr_threshold": True,
        "sum_product_msg_llr_threshold": 100.0,
        "batch_size": 16,
        "code_rate_QBER_parameters": [
            {"code_rate": 0.58, "QBER_begin": 0.03, "QBER_end": 0.04, "QBER_step": 0.005}
        ],
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    return tmp_path


def test_batch_run(workspace, capsys):
    rc = main(["--config", str(workspace / "config.json"), "--no-progress"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "BATCH MODE" in out
    csvs = list((workspace / "results").iterdir())
    assert len(csvs) == 1
    lines = csvs[0].read_text().strip().split("\n")
    assert len(lines) == 3  # header + 2 QBER points
    assert lines[1].split(";")[1] == "c128.txt"


def test_missing_config_exits_1(tmp_path, capsys):
    rc = main(["--config", str(tmp_path / "nope.json")])
    assert rc == 1
    assert "ERROR" in capsys.readouterr().err


def test_interactive(workspace, capsys, monkeypatch):
    monkeypatch.setattr("builtins.input", lambda _: "1")
    rc = main(["--config", str(workspace / "config.json"), "--interactive"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "INTERACTIVE MODE" in out
    assert "Actual QBER" in out
    assert "Iterations performed" in out


def test_generate(tmp_path, capsys):
    out_path = tmp_path / "gen.alist"
    rc = main([
        "generate", "--n", "256", "--m", "128", "--dv", "3",
        "--seed", "9", "-o", str(out_path),
    ])
    assert rc == 0
    code = read_alist(out_path)
    assert code.n_vars == 256 and code.n_checks == 128
    np.testing.assert_array_equal(code.var_deg, np.full(256, 3))


def test_generate_qc(tmp_path, capsys):
    out_path = tmp_path / "qc.alist"
    rc = main([
        "generate", "--n", "512", "--m", "256", "--qc", "64",
        "--seed", "3", "-o", str(out_path),
    ])
    assert rc == 0
    code = read_alist(out_path)
    assert code.n_vars == 512 and code.n_checks == 256
    np.testing.assert_array_equal(code.var_deg, np.full(512, 3))
    # generate --qc writes a .qc.json sidecar; the reloaded code carries
    # the roll layout, so decoding picks the fast routing (round 4).
    assert code.qc is not None
    assert code.qc[0] == 64  # lift size z

    # non-multiple dimensions are rejected with the reference-style
    # error-to-exit-1 contract
    rc = main([
        "generate", "--n", "500", "--m", "256", "--qc", "64",
        "--seed", "3", "-o", str(tmp_path / "bad.alist"),
    ])
    assert rc == 1


def test_cli_profile_flag(tmp_path):
    """--profile captures a jax.profiler trace directory during the sweep."""
    import json as _json

    from qkd_ldpc_tpu.codes import make_code, write_alist

    mdir = tmp_path / "m"
    mdir.mkdir()
    write_alist(make_code(n=64, m=33, dv=3, seed=1), mdir / "c.alist")
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(_json.dumps({
        "trials_number": 4, "simulation_seed": 1,
        "sum_product_max_iterations": 30,
        "code_rate_QBER_parameters": [
            {"code_rate": 0.6, "QBER_begin": 0.03, "QBER_end": 0.06,
             "QBER_step": 0.03}],
    }))
    prof = tmp_path / "prof"
    rc = main([
        "--config", str(cfgp), "--matrix-dir", str(mdir),
        "--results-dir", str(tmp_path / "res"), "--no-progress",
        "--profile", str(prof),
    ])
    assert rc == 0
    assert any(prof.rglob("*.xplane.pb")) or any(prof.rglob("*.trace*"))
