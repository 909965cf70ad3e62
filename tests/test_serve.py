"""Serving wrapper (qkd_ldpc_tpu.serve.Reconciler) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
from qkd_ldpc_tpu.decoder import DecodeOptions
from qkd_ldpc_tpu.decoder.reconcile import reconcile
from qkd_ldpc_tpu.serve import Reconciler


def _trials(code, qber, n, seed=7):
    n_err = num_errors_for(code.n_vars, qber)
    alice, bob = make_trial_batch(
        jax.random.PRNGKey(seed), code.n_vars, n, jnp.asarray(n_err, jnp.int32)
    )
    return np.asarray(alice), np.asarray(bob), n_err / code.n_vars


def test_reconciler_matches_library_path(medium_code):
    """Serving results == the library reconcile() on the same frames,
    including across chunk boundaries (request 2.5x the lane count)."""
    opts = DecodeOptions(max_iterations=60)
    rec = Reconciler(medium_code, opts, lanes=8).warmup()
    alice, bob, q = _trials(medium_code, 0.03, 20)

    syn = rec.syndromes(alice)
    out = rec.reconcile(bob, syn, qber=q)
    ref = reconcile(medium_code, alice, bob, q, opts)

    np.testing.assert_array_equal(out.bits, np.asarray(ref.bits).astype(np.uint8))
    np.testing.assert_array_equal(out.iterations, np.asarray(ref.iterations))
    np.testing.assert_array_equal(
        out.syndromes_match, np.asarray(ref.syndromes_match)
    )
    assert out.syndromes_match.all()
    np.testing.assert_array_equal(out.bits, alice)  # corrected to Alice's key


def test_reconciler_padding_independence(medium_code):
    """A frame decodes identically whether it arrives alone or in a padded
    chunk (lane padding must not leak into real lanes)."""
    rec = Reconciler(medium_code, DecodeOptions(max_iterations=60), lanes=16)
    alice, bob, q = _trials(medium_code, 0.03, 5, seed=3)
    syn = rec.syndromes(alice)
    all_out = rec.reconcile(bob, syn, qber=q)
    one = rec.reconcile(bob[2], syn[2], qber=q)
    np.testing.assert_array_equal(one.bits, all_out.bits[2])
    assert int(one.iterations) == int(all_out.iterations[2])


def test_reconciler_failure_is_flagged(medium_code):
    """Deep-waterfall frames must come back with syndromes_match False."""
    rec = Reconciler(medium_code, DecodeOptions(max_iterations=15), lanes=8)
    alice, bob, q = _trials(medium_code, 0.12, 8, seed=1)
    out = rec.reconcile(bob, rec.syndromes(alice), qber=q)
    assert not out.syndromes_match.all()
    # failed frames report the iteration cap, as the protocol result does
    assert (out.iterations[~out.syndromes_match] == 15).all()


def test_reconciler_validation(medium_code):
    rec = Reconciler(medium_code)
    good = np.zeros((2, medium_code.n_vars), np.uint8)
    syn = np.zeros((2, medium_code.n_checks), np.uint8)
    with pytest.raises(ValueError, match="frames"):
        rec.reconcile(good[:, :-1], syn, qber=0.03)
    with pytest.raises(ValueError, match="syndromes"):
        rec.reconcile(good, syn[:1], qber=0.03)
    with pytest.raises(ValueError, match="qber"):
        rec.reconcile(good, syn, qber=0.0)
    with pytest.raises(ValueError, match="frames"):
        rec.syndromes(good[:, :-1])
    with pytest.raises(ValueError, match="lanes"):
        Reconciler(medium_code, lanes=0)
    assert rec.leak_bits == medium_code.n_checks


def test_rate_adapted_reconciler(medium_code):
    """A shortened endpoint serves payload-bit requests and reconciles a
    channel the mother rate cannot, matching the adapter's library path."""
    from qkd_ldpc_tpu.decoder.rate_adapt import RateAdapter

    ad = RateAdapter.make(medium_code, n_shortened=128, seed=2)
    opts = DecodeOptions(max_iterations=60)
    rec = Reconciler(medium_code, opts, lanes=8, adapter=ad).warmup()
    assert rec.frame_bits == ad.payload_bits
    assert rec.leak_bits == medium_code.n_checks

    l = ad.payload_bits
    kk = jax.random.PRNGKey(5)
    alice = np.asarray(jax.random.bernoulli(kk, 0.5, (10, l))).astype(np.uint8)
    n_err = num_errors_for(l, 0.07)
    bob = np.asarray(jax.random.bernoulli(kk, 0.0, (10, l))).astype(np.uint8)
    import jax.numpy as jnp2
    from qkd_ldpc_tpu.channel.keys import introduce_errors
    bob = np.asarray(introduce_errors(jax.random.fold_in(kk, 1),
                                      jnp2.asarray(alice), n_err))

    syn = rec.syndromes(alice)
    out = rec.reconcile(bob, syn, qber=n_err / l)
    assert out.syndromes_match.all()
    np.testing.assert_array_equal(out.bits, alice)

    # library path agreement (same shortened pattern via shared_seed=0)
    kh, it, ok = ad.reconcile(jnp2.asarray(bob), jnp2.asarray(syn),
                              n_err / l, opts)
    np.testing.assert_array_equal(out.bits, np.asarray(kh))
    np.testing.assert_array_equal(out.iterations, np.asarray(it))


def test_punctured_reconciler_requires_frame_key(medium_code):
    from qkd_ldpc_tpu.decoder.rate_adapt import RateAdapter

    ad = RateAdapter.make(medium_code, n_punctured=64, seed=3)
    rec = Reconciler(medium_code, DecodeOptions(max_iterations=40),
                     lanes=4, adapter=ad)
    alice = np.zeros((2, ad.payload_bits), np.uint8)
    with pytest.raises(ValueError, match="frame_key"):
        rec.syndromes(alice)
    syn = rec.syndromes(alice, frame_key=jax.random.PRNGKey(1))
    out = rec.reconcile(alice, syn, qber=0.01)  # noiseless payload
    assert out.syndromes_match.all()
    np.testing.assert_array_equal(out.bits, alice)


def test_adapter_code_mismatch_rejected(medium_code):
    from qkd_ldpc_tpu.codes import make_code
    from qkd_ldpc_tpu.decoder.rate_adapt import RateAdapter

    other = make_code(n=128, m=65, dv=3, seed=9)
    ad = RateAdapter.make(other, n_shortened=16)
    with pytest.raises(ValueError, match="different code"):
        Reconciler(medium_code, adapter=ad)


def test_adapter_same_shape_different_graph_rejected(medium_code):
    """Round 3: binding is by parity-check CONTENT fingerprint — a
    same-(N, M) adapter from a different graph must be rejected (it
    would silently garble every key)."""
    from qkd_ldpc_tpu.codes import make_code
    from qkd_ldpc_tpu.decoder.rate_adapt import RateAdapter

    same_shape = make_code(
        n=medium_code.n_vars, m=medium_code.n_checks, dv=3, seed=1234
    )
    assert same_shape.fingerprint != medium_code.fingerprint
    ad = RateAdapter.make(same_shape, n_shortened=16)
    with pytest.raises(ValueError, match="fingerprint"):
        Reconciler(medium_code, adapter=ad)

    # An equal-content copy (e.g. loaded from disk) is accepted.
    import dataclasses

    copy = dataclasses.replace(medium_code)
    ad2 = RateAdapter.make(copy, n_shortened=16)
    Reconciler(medium_code, adapter=ad2)  # no raise


def test_reconcile_secure_chain(medium_code):
    """reconcile -> tags -> amplification in one call: verified frames
    yield Alice-equal amplified key material; a corrupted frame fails
    verification even when its syndrome (trivially) matches."""
    opts = DecodeOptions(max_iterations=60)
    rec = Reconciler(medium_code, opts, lanes=8)
    alice, bob, q = _trials(medium_code, 0.03, 10)
    syn = rec.syndromes(alice)
    tag_key, pa_key = jax.random.PRNGKey(11), jax.random.PRNGKey(12)

    a_tags = rec.tags(alice, tag_key)
    sec = rec.reconcile_secure(bob, syn, q, a_tags, tag_key, pa_key)
    assert sec.verified.all()
    assert sec.final_bits == rec.final_key_bits()
    assert sec.final_bits > 0
    assert sec.key.shape == (10, sec.final_bits)
    np.testing.assert_array_equal(sec.leak_bits,
                                  medium_code.n_checks + 64)

    # Bob's amplified key must equal Alice amplifying HER key with the
    # same pa seed (the whole point of reconciliation).
    from qkd_ldpc_tpu.postprocess import privacy_amplify

    a_key = np.asarray(privacy_amplify(jnp.asarray(alice), pa_key,
                                       sec.final_bits))
    np.testing.assert_array_equal(sec.key, a_key)

    # Tamper with Alice's tag for frame 3: verification must fail it.
    bad = a_tags.copy()
    bad[3, 0] ^= 1
    sec2 = rec.reconcile_secure(bob, syn, q, bad, tag_key, pa_key)
    assert not sec2.verified[3] and sec2.verified[[0, 1, 2, 4]].all()


def test_reconcile_secure_single_frame(medium_code):
    opts = DecodeOptions(max_iterations=60)
    rec = Reconciler(medium_code, opts, lanes=4)
    alice, bob, q = _trials(medium_code, 0.03, 1)
    syn = rec.syndromes(alice[0])
    tag_key, pa_key = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a_tag = rec.tags(alice[0], tag_key)
    sec = rec.reconcile_secure(bob[0], syn, q, a_tag, tag_key, pa_key)
    assert sec.verified and sec.key.shape == (sec.final_bits,)


def test_pipelined_chunks_match_single_chunk(medium_code):
    """Many-chunk pipelined dispatch must equal a one-chunk endpoint
    result-for-result (pipelining is a scheduling change only)."""
    opts = DecodeOptions(max_iterations=60)
    alice, bob, q = _trials(medium_code, 0.03, 21, seed=9)
    syn = Reconciler(medium_code, opts, lanes=32).syndromes(alice)
    small = Reconciler(medium_code, opts, lanes=4).reconcile(bob, syn, q)
    big = Reconciler(medium_code, opts, lanes=32).reconcile(bob, syn, q)
    np.testing.assert_array_equal(small.bits, big.bits)
    np.testing.assert_array_equal(small.iterations, big.iterations)
    np.testing.assert_array_equal(small.syndromes_match, big.syndromes_match)


def test_reconcile_secure_on_adapted_endpoint():
    """The full chain composes with rate adaptation: tags/amplification
    run over PAYLOAD bits and the leakage ledger follows the adapter
    (syndrome net of punctured entropy + tag bits).  (A code large
    enough that the leftover-hash budget stays positive after the
    security margin: N=2048 -> 742 final bits.)"""
    from qkd_ldpc_tpu.codes import make_code
    from qkd_ldpc_tpu.decoder.rate_adapt import RateAdapter
    from qkd_ldpc_tpu.postprocess import privacy_amplify

    code = make_code(n=2048, m=1046, dv=3, seed=5)
    ad = RateAdapter.make(code, n_shortened=96, seed=2)
    opts = DecodeOptions(max_iterations=60)
    rec = Reconciler(code, opts, lanes=8, adapter=ad)
    l = ad.payload_bits
    kk = jax.random.PRNGKey(6)
    alice = np.asarray(jax.random.bernoulli(kk, 0.5, (6, l))).astype(np.uint8)
    from qkd_ldpc_tpu.channel.keys import introduce_errors

    n_err = num_errors_for(l, 0.05)
    bob = np.asarray(introduce_errors(jax.random.fold_in(kk, 1),
                                      jnp.asarray(alice), n_err))
    syn = rec.syndromes(alice)
    tk, pk = jax.random.PRNGKey(8), jax.random.PRNGKey(9)
    a_tags = rec.tags(alice, tk)
    sec = rec.reconcile_secure(bob, syn, n_err / l, a_tags, tk, pk)
    assert sec.verified.all()
    np.testing.assert_array_equal(
        sec.leak_bits, np.full(6, ad.leak_bits + 64)  # adapter + tag bits
    )
    assert sec.final_bits == rec.final_key_bits() > 0
    a_key = np.asarray(privacy_amplify(jnp.asarray(alice), pk,
                                       sec.final_bits))
    np.testing.assert_array_equal(sec.key, a_key)
