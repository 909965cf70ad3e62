"""One-off hardware check: roll routing == gather routing ON THE TPU.

The CPU test suite validates roll-vs-gather bit-identity through the
gather-style `_rot` lowering (see decoder/qc_routing.py); this script
asserts the same identity with the TPU's slice-concat lowering on real
hardware, for both algorithms and bf16, on a mid-size QC code.

Usage (on the TPU): python benchmarks/qc_tpu_identity.py
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
    from qkd_ldpc_tpu.codes import make_qc_code
    from qkd_ldpc_tpu.decoder import DecodeOptions, decode
    from qkd_ldpc_tpu.decoder.reconcile import apriori_llr
    from qkd_ldpc_tpu.decoder.syndrome import syndrome
    from qkd_ldpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    code = make_qc_code(z=64, nb=16, mb=8, dv=3, seed=7).to_device()
    n_err = num_errors_for(code.n_vars, 0.05)
    alice, bob = make_trial_batch(
        jax.random.PRNGKey(5), code.n_vars, 128, jnp.asarray(n_err, jnp.int32)
    )
    llr = apriori_llr(bob, n_err / code.n_vars)
    syn = syndrome(code, alice)
    print(f"device: {jax.devices()[0]}  {code}", file=sys.stderr)

    for alg in ("sum-product", "min-sum"):
        for dt in ("float32", "bfloat16"):
            roll = decode(code, llr, syn, DecodeOptions(
                max_iterations=80, algorithm=alg, message_dtype=dt,
                routing="roll"))
            gather = decode(code, llr, syn, DecodeOptions(
                max_iterations=80, algorithm=alg, message_dtype=dt,
                routing="gather"))
            assert np.array_equal(np.asarray(roll.bits),
                                  np.asarray(gather.bits)), (alg, dt)
            assert np.array_equal(np.asarray(roll.iterations),
                                  np.asarray(gather.iterations)), (alg, dt)
            conv = int(np.asarray(roll.syndromes_match).sum())
            print(f"{alg:12s} {dt:9s}: bit-identical on TPU "
                  f"({conv}/128 converged)")


if __name__ == "__main__":
    main()
