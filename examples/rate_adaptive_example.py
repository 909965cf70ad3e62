"""Walkthrough: rate-adapted and blind reconciliation over one mother code.

The reference's example program (example/qkd_ldpc_example.cpp) walks one
fixed-rate decode; this one walks the production protocol layers added
on top — the same decoder serving a drifting channel from a single code:

1. fixed-rate reconciliation through the serving endpoint,
2. shortening the code when the channel degrades past its waterfall,
3. blind reconciliation when no QBER estimate exists at all.

Run:  python examples/rate_adaptive_example.py   (CPU-friendly sizes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qkd_ldpc_tpu.channel.keys import introduce_errors, num_errors_for
from qkd_ldpc_tpu.codes import make_code
from qkd_ldpc_tpu.decoder import DecodeOptions, RateAdapter
from qkd_ldpc_tpu.decoder.blind import blind_reconcile_sim
from qkd_ldpc_tpu.serve import Reconciler


def banner(s):
    print(f"\n=== {s} " + "=" * max(0, 60 - len(s)))


def main():
    # One mother code (R ~ 0.49, the flagship profile at a CPU-sized N).
    code = make_code(n=2048, m=1046, dv=3, seed=4, name="mother-2048")
    opts = DecodeOptions(max_iterations=60)
    rng = jax.random.PRNGKey(7)

    banner(f"mother code {code.name}: R = {code.code_rate:.3f}")

    # --- 1. fixed-rate serving at a good channel (QBER 3%) --------------
    rec = Reconciler(code, opts, lanes=8).warmup()
    alice = jax.random.bernoulli(rng, 0.5, (8, code.n_vars)).astype(jnp.uint8)
    n_err = num_errors_for(code.n_vars, 0.03)
    bob = introduce_errors(jax.random.fold_in(rng, 1), alice, n_err)
    syn = rec.syndromes(np.asarray(alice))
    out = rec.reconcile(np.asarray(bob), syn, qber=n_err / code.n_vars)
    assert out.syndromes_match.all()
    print(f"QBER 3.0%: 8/8 frames corrected via Reconciler, "
          f"mean {out.iterations.mean():.1f} iterations, "
          f"leak {rec.leak_bits} bits/frame")

    # --- 2. the channel degrades past the mother code's waterfall -------
    qber_bad = 0.095
    n_err = num_errors_for(code.n_vars, qber_bad)
    bob_bad = introduce_errors(jax.random.fold_in(rng, 2), alice, n_err)
    out = rec.reconcile(np.asarray(bob_bad), syn, qber=n_err / code.n_vars)
    print(f"QBER {qber_bad:.1%}: mother code verifies "
          f"{int(out.syndromes_match.sum())}/8 frames — shorten instead:")

    ad = RateAdapter.make(code, n_shortened=512, seed=2)
    l = ad.payload_bits
    a_key = jax.random.bernoulli(jax.random.fold_in(rng, 3), 0.5, (8, l)).astype(jnp.uint8)
    ne = num_errors_for(l, qber_bad)
    b_key = introduce_errors(jax.random.fold_in(rng, 4), a_key, ne)
    frames = ad.build_frames(a_key, jax.random.fold_in(rng, 5))
    key_hat, iters, ok = ad.reconcile(b_key, ad.syndromes(frames), ne / l, opts)
    assert np.asarray(ok).all()
    assert (np.asarray(key_hat) == np.asarray(a_key)).all()
    print(f"  shortened s=512 (R_eff = {ad.effective_rate:.3f}): 8/8 frames, "
          f"mean {np.asarray(iters).mean():.1f} iterations")

    # --- 3. no QBER estimate at all: blind reconciliation ---------------
    d = 256
    l = code.n_vars - d
    a_key = jax.random.bernoulli(jax.random.fold_in(rng, 6), 0.5, (8, l)).astype(jnp.uint8)
    ne = num_errors_for(l, 0.05)
    b_key = introduce_errors(jax.random.fold_in(rng, 7), a_key, ne)
    res, km = blind_reconcile_sim(
        code, a_key, b_key, n_punctured=d, qber_hint=0.05,
        opts=opts, reveal_step=64,
    )
    assert km.all()
    print(f"blind (d={d} punctured, no estimate): 8/8 frames, "
          f"reveal rounds {sorted(set(res.rounds.tolist()))}, "
          f"per-frame leak {sorted(set(res.leak_bits.tolist()))} bits "
          f"(fixed-rate would leak {code.n_checks})")

    # --- 4. verify + amplify: the full production chain -----------------
    from qkd_ldpc_tpu.postprocess import (
        amplified_key_bits, privacy_amplify, verification_tags,
    )

    vkey, pkey = jax.random.PRNGKey(99), jax.random.PRNGKey(123)
    # back on the good channel from step 1
    good = rec.reconcile(np.asarray(bob), syn,
                         qber=num_errors_for(code.n_vars, 0.03) / code.n_vars)
    tags_bob = np.asarray(verification_tags(jnp.asarray(good.bits), vkey))
    # (deployed Alice computes hers over her own key; here we are Alice too)
    tags_alice = np.asarray(verification_tags(alice, vkey))
    verified = (tags_bob == tags_alice).all(axis=1)
    k_final = amplified_key_bits(code.n_vars, rec.leak_bits)
    final = np.asarray(
        privacy_amplify(jnp.asarray(good.bits[verified]), pkey, k_final)
    )
    assert verified.all()
    print(f"verify + amplify: {int(verified.sum())}/8 frames verified, "
          f"final secret key {k_final} bits/frame "
          f"(from {code.n_vars} sifted bits, leak {rec.leak_bits} + tag 64 "
          f"+ security 100)")
    assert final.shape[1] == k_final

    banner("done")


if __name__ == "__main__":
    main()
