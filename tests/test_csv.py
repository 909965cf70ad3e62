"""CSV writer tests: reference schema parity, filename dedup."""

import pytest

from qkd_ldpc_tpu.sim import CSV_HEADER, format_rows, results_file_path, write_results
from qkd_ldpc_tpu.sim.stats import SimResult


def _result(i=0, qber=0.03):
    return SimResult(
        sim_number=i,
        matrix_filename="(N=10240,M=5231,R=0.49,CW=3,SEED=666).txt",
        is_regular=False,
        num_bit_nodes=10240,
        num_check_nodes=5231,
        initial_qber=qber,
        iterations_successful_sp_mean=4.03,
        iterations_successful_sp_std_dev=0.52,
        iterations_successful_sp_min=3,
        iterations_successful_sp_max=5,
        ratio_trials_successful_sp=1.0,
        ratio_trials_successful_ldpc=0.98,
    )


def test_header_schema():
    # Exact reference header (simulation.cpp:26-27), semicolon-separated.
    assert CSV_HEADER.startswith("№;MATRIX_FILENAME;TYPE;CODE_RATE;M;N;QBER;")
    assert CSV_HEADER.endswith(
        "RATIO_TRIALS_SUCCESSFUL_SP;RATIO_TRIALS_SUCCESSFUL_LDPC;FER"
    )
    assert CSV_HEADER.count(";") == 13


def test_row_contents():
    text = format_rows([_result()])
    lines = text.strip().split("\n")
    assert len(lines) == 2
    cells = lines[1].split(";")
    assert cells[0] == "0"
    assert cells[2] == "irregular"
    assert cells[3] == "0.489160"[:len(cells[3])] or float(cells[3]) > 0.48
    assert cells[4] == "5231" and cells[5] == "10240"
    assert float(cells[13]) == pytest.approx(1.0 - 0.98)  # FER


def test_filename_and_dedup(tmp_path):
    p1 = write_results([_result()], tmp_path, 5000, 100, 777)
    assert p1.name == "ldpc(trial_num=5000,max_sum_prod_iters=100,seed=777).csv"
    p2 = write_results([_result()], tmp_path, 5000, 100, 777)
    assert p2.name == "ldpc(trial_num=5000,max_sum_prod_iters=100,seed=777)_1.csv"
    p3 = write_results([_result()], tmp_path, 5000, 100, 777)
    assert p3.name.endswith("_2.csv")
    assert p1.read_text().startswith(CSV_HEADER)


def test_creates_directory(tmp_path):
    d = tmp_path / "nested" / "results"
    write_results([_result()], d, 10, 5, 1)
    assert d.exists()
