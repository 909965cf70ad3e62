"""Real multi-process jax.distributed test on the CPU backend.

Two coordinated processes (gloo collectives over localhost), each with 4
virtual CPU devices, form a global 8-device ``trial`` mesh and run the
sharded Monte-Carlo sweep.  Results must be bit-identical across ranks
AND to the plain single-process runner — the framework's determinism
contract extends across process boundaries (the multi-host analog of the
reference's thread-schedule independence, ``src/simulation.cpp:222-247``).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from qkd_ldpc_tpu.codes import make_code
from qkd_ldpc_tpu.decoder import DecodeOptions
from qkd_ldpc_tpu.sim.runner import run_point

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4
from qkd_ldpc_tpu.codes import make_code
from qkd_ldpc_tpu.decoder import DecodeOptions
from qkd_ldpc_tpu.parallel import make_trial_mesh, run_point_sharded
code = make_code(n=256, m=131, dv=3, seed=1)
p, q = run_point_sharded(code, jax.random.PRNGKey(777), 0.03, trials=64,
                         batch=32, opts=DecodeOptions(max_iterations=40),
                         mesh=make_trial_mesh())
print(f"RESULT {p.n_trials} {p.n_sp} {p.n_ldpc} {p.sum_it} {p.sum_it2} "
      f"{p.min_it} {p.max_it}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_sweep_matches_single():
    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {**os.environ, "PYTHONPATH": str(Path(__file__).resolve().parent.parent)}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    results = []
    for i, (out, err) in enumerate(outs):
        assert procs[i].returncode == 0, f"proc {i} failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, out
        results.append(line[0].split()[1:])

    assert results[0] == results[1], "ranks disagree"

    # Single-process ground truth (the determinism contract).
    import jax

    code = make_code(n=256, m=131, dv=3, seed=1)
    p, _ = run_point(code, jax.random.PRNGKey(777), 0.03, trials=64, batch=64,
                     opts=DecodeOptions(max_iterations=40))
    expected = [str(x) for x in
                (p.n_trials, p.n_sp, p.n_ldpc, p.sum_it, p.sum_it2,
                 p.min_it, p.max_it)]
    assert results[0] == expected, (results[0], expected)
