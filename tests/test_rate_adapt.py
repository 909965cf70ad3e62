"""Rate-adaptive reconciliation (puncturing/shortening) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_tpu.channel.keys import introduce_errors, num_errors_for
from qkd_ldpc_tpu.codes import make_code
from qkd_ldpc_tpu.decoder import DecodeOptions
from qkd_ldpc_tpu.decoder.rate_adapt import RateAdapter


@pytest.fixture(scope="module")
def mother():
    # R ~ 0.49 mother code; its waterfall sits near QBER ~0.075-0.085
    # at a moderate iteration cap.
    return make_code(n=1024, m=523, dv=3, seed=3, name="mother-1024")


def _protocol(adapter, qber, batch, seed, opts):
    """One full rate-adapted protocol round; returns (alice_key, key_hat,
    iters, ok)."""
    l = adapter.payload_bits
    kk = jax.random.PRNGKey(seed)
    alice_key = jax.random.bernoulli(kk, 0.5, (batch, l)).astype(jnp.uint8)
    n_err = num_errors_for(l, qber)
    bob_key = introduce_errors(jax.random.fold_in(kk, 1), alice_key, n_err)
    frames = adapter.build_frames(alice_key, jax.random.fold_in(kk, 2))
    syn = adapter.syndromes(frames)
    key_hat, iters, ok = adapter.reconcile(
        bob_key, syn, n_err / l, opts=opts
    )
    return np.asarray(alice_key), np.asarray(key_hat), np.asarray(iters), \
        np.asarray(ok), frames


def test_rate_accounting(mother):
    a = RateAdapter.make(mother, n_punctured=128, n_shortened=64, seed=1)
    N, M = mother.n_vars, mother.n_checks
    assert a.payload_bits == N - 192
    assert a.effective_rate == pytest.approx(1 - (M - 128) / (N - 192))
    assert a.leak_bits == M - 128
    # plain adapter == mother code rate
    plain = RateAdapter.make(mother)
    assert plain.effective_rate == pytest.approx(mother.code_rate)
    assert plain.payload_bits == N


def test_validation(mother):
    with pytest.raises(ValueError, match="payload"):
        RateAdapter.make(mother, n_punctured=mother.n_vars)
    with pytest.raises(ValueError, match="overlap"):
        RateAdapter.make(mother, punctured=[1, 2], shortened=[2, 3])
    with pytest.raises(ValueError, match="range"):
        RateAdapter.make(mother, punctured=[mother.n_vars])


def test_shortening_extends_reach(mother):
    """At QBER 0.095 the R=0.49 mother code fails outright; shortening
    256 bits (R_eff = 0.32) makes the same channel decodable."""
    opts = DecodeOptions(max_iterations=60)
    plain = RateAdapter.make(mother)
    _, _, _, ok0, _ = _protocol(plain, 0.095, 8, 5, opts)
    assert not ok0.any()

    short = RateAdapter.make(mother, n_shortened=256, seed=2)
    assert short.effective_rate < 0.35
    ak, kh, it, ok1, _ = _protocol(short, 0.095, 8, 5, opts)
    assert ok1.all(), it
    np.testing.assert_array_equal(kh, ak)  # corrected keys exact


def test_puncturing_raises_rate_and_cuts_leak(mother):
    """Puncturing 256 bits raises R_eff to ~0.65: still decodes at QBER
    0.02 (with the punctured bits recovered through the code), fails at
    QBER 0.065 where the mother code still succeeds."""
    opts = DecodeOptions(max_iterations=60)
    punct = RateAdapter.make(mother, n_punctured=256, seed=4)
    assert punct.effective_rate > 0.6
    assert punct.leak_bits == mother.n_checks - 256

    ak, kh, _, ok, frames = _protocol(punct, 0.02, 8, 7, opts)
    assert ok.all()
    np.testing.assert_array_equal(kh, ak)

    # punctured bits themselves are recovered by the decoder
    from qkd_ldpc_tpu.decoder import decode

    bob = introduce_errors(
        jax.random.fold_in(jax.random.PRNGKey(7), 1), jnp.asarray(ak),
        num_errors_for(punct.payload_bits, 0.02),
    )
    llr = punct.llr(bob, num_errors_for(punct.payload_bits, 0.02) / punct.payload_bits)
    res = decode(mother, llr, punct.syndromes(frames), opts)
    np.testing.assert_array_equal(
        np.asarray(res.bits).astype(np.uint8), np.asarray(frames)
    )

    # ...but the raised rate fails where the mother code still works
    _, _, _, ok_hi, _ = _protocol(punct, 0.065, 8, 9, opts)
    assert not ok_hi.all()
    plain = RateAdapter.make(mother)
    _, _, _, ok_m, _ = _protocol(plain, 0.065, 8, 9, opts)
    assert ok_m.all()


def test_shared_pattern_consistency(mother):
    """Alice's frame construction and Bob's pinned LLRs must agree on the
    shortened pattern for any shared seed."""
    a = RateAdapter.make(mother, n_shortened=64, seed=11)
    pat = np.asarray(a.short_pattern(shared_seed=5))
    key = jnp.zeros((1, a.payload_bits), jnp.uint8)
    frame = np.asarray(a.build_frames(key, jax.random.PRNGKey(0), shared_seed=5))
    np.testing.assert_array_equal(frame[0, a.short_idx], pat)
    llr = np.asarray(a.llr(key, 0.03, shared_seed=5))
    signs = llr[0, a.short_idx] < 0
    np.testing.assert_array_equal(signs, pat.astype(bool))


@pytest.mark.slow
def test_rate_adaptive_example_runs(capsys):
    import importlib.util
    import pathlib

    path = (pathlib.Path(__file__).parent.parent / "examples"
            / "rate_adaptive_example.py")
    spec = importlib.util.spec_from_file_location("ra_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    assert "8/8 frames corrected via Reconciler" in out
    assert "shortened s=512" in out
    assert "blind (d=256 punctured" in out


def test_rate_adaptation_composes_with_layered_schedule():
    """Rate adaptation is pure LLR bookkeeping over the UNMODIFIED
    mother graph (module docstring), so a QC mother code keeps its
    layered schedule: shortened frames decode with schedule='layered'
    (+ compaction) to the exact keys, at a point the plain-rate code
    cannot reach."""
    from qkd_ldpc_tpu.codes import make_qc_code

    mother_qc = make_qc_code(z=32, nb=32, mb=16, dv=3, seed=11)  # R=0.5
    opts = DecodeOptions(max_iterations=60, schedule="layered",
                         compact_after=2, compact_lanes=2)
    short = RateAdapter.make(mother_qc, n_shortened=256, seed=4)
    assert short.effective_rate < 0.36
    ak, kh, it, ok, _ = _protocol(short, 0.095, 8, 7, opts)
    assert ok.all(), it
    np.testing.assert_array_equal(kh, ak)
