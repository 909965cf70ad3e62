"""Monte-Carlo simulation: sweep planning, runners, stats, CSV output."""

from qkd_ldpc_tpu.sim.csv_writer import (
    CSV_HEADER,
    format_rows,
    results_file_path,
    write_results,
)
from qkd_ldpc_tpu.sim.interactive import interactive_simulation, select_matrix_file
from qkd_ldpc_tpu.sim.tracing import ConsoleTracer, TraceFlags, traced_reconcile
from qkd_ldpc_tpu.sim.planner import rate_based_qber_range
from qkd_ldpc_tpu.sim.runner import (
    SimInput,
    auto_batch_size,
    batch_simulation,
    decode_options_from_config,
    prepare_sim_inputs,
    run_point,
    simulate_directory,
)
from qkd_ldpc_tpu.sim.stats import (
    PointPartials,
    SimResult,
    finalize_point,
    partials_from_device,
    reduce_trials,
)

__all__ = [
    "CSV_HEADER",
    "format_rows",
    "results_file_path",
    "write_results",
    "interactive_simulation",
    "ConsoleTracer",
    "TraceFlags",
    "traced_reconcile",
    "select_matrix_file",
    "rate_based_qber_range",
    "SimInput",
    "auto_batch_size",
    "batch_simulation",
    "decode_options_from_config",
    "prepare_sim_inputs",
    "run_point",
    "simulate_directory",
    "PointPartials",
    "SimResult",
    "finalize_point",
    "partials_from_device",
    "reduce_trials",
]
