"""Verification hashing + privacy amplification tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qkd_ldpc_tpu.postprocess import (
    amplified_key_bits,
    privacy_amplify,
    toeplitz_hash,
    toeplitz_matrix,
    verification_tags,
)


def test_toeplitz_matches_numpy_gf2():
    """The MXU GF(2) matvec equals an explicit NumPy mod-2 product."""
    key = jax.random.PRNGKey(3)
    n, k, B = 300, 75, 9
    bits = np.asarray(
        jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5, (B, n))
    ).astype(np.uint8)
    T = np.asarray(toeplitz_matrix(key, n, k)).astype(np.int64)
    want = (bits @ T.T) % 2
    got = np.asarray(toeplitz_hash(jnp.asarray(bits), key, k))
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_toeplitz_structure_and_determinism():
    key = jax.random.PRNGKey(7)
    T = np.asarray(toeplitz_matrix(key, 40, 16)).astype(int)
    # constant along diagonals: T[i, j] == T[i+1, j+1]
    np.testing.assert_array_equal(T[:-1, :-1], T[1:, 1:])
    T2 = np.asarray(toeplitz_matrix(key, 40, 16)).astype(int)
    np.testing.assert_array_equal(T, T2)
    # a different seed gives a different matrix
    T3 = np.asarray(toeplitz_matrix(jax.random.PRNGKey(8), 40, 16)).astype(int)
    assert not np.array_equal(T, T3)


def test_verification_catches_undetected_errors():
    """Tags agree iff the keys agree (up to the 2^-64 collision bound,
    unobservable here); a single flipped bit flips tags."""
    key = jax.random.PRNGKey(5)
    bits = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5, (8, 512)).astype(jnp.uint8)
    tags_a = np.asarray(verification_tags(bits, key))
    tags_b = np.asarray(verification_tags(bits, key))
    np.testing.assert_array_equal(tags_a, tags_b)

    corrupted = bits.at[:, 37].set(1 - bits[:, 37])
    tags_c = np.asarray(verification_tags(corrupted, key))
    assert (tags_c != tags_a).any(axis=1).all()  # every frame flagged


def test_two_universal_collision_rate():
    """Over random seeds, distinct inputs collide on a 8-bit hash at
    ~2^-8 — the 2-universal guarantee, measured."""
    x = jnp.zeros((1, 256), jnp.uint8)
    y = x.at[0, 3].set(1)
    coll = 0
    reps = 600
    for r in range(reps):
        k = jax.random.fold_in(jax.random.PRNGKey(11), r)
        hx = np.asarray(toeplitz_hash(x, k, 8))
        hy = np.asarray(toeplitz_hash(y, k, 8))
        coll += int((hx == hy).all())
    p = coll / reps
    assert abs(p - 1 / 256) < 5 * np.sqrt((1 / 256) * (1 - 1 / 256) / reps), p


def test_amplified_key_accounting():
    assert amplified_key_bits(10240, leak_bits=5231) == 10240 - 5231 - 64 - 100
    assert amplified_key_bits(1000, leak_bits=900) == 0
    with pytest.raises(ValueError, match="no key material"):
        privacy_amplify(jnp.zeros((1, 100), jnp.uint8), jax.random.PRNGKey(0), 0)


def test_end_to_end_with_reconciler(medium_code):
    """Full production chain: reconcile -> verify -> amplify, with the
    leakage budget from the serving endpoint."""
    from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
    from qkd_ldpc_tpu.decoder import DecodeOptions
    from qkd_ldpc_tpu.serve import Reconciler

    rec = Reconciler(medium_code, DecodeOptions(max_iterations=60), lanes=8)
    n_err = num_errors_for(medium_code.n_vars, 0.03)
    alice, bob = make_trial_batch(
        jax.random.PRNGKey(7), medium_code.n_vars, 8,
        jnp.asarray(n_err, jnp.int32),
    )
    alice, bob = np.asarray(alice), np.asarray(bob)
    out = rec.reconcile(bob, rec.syndromes(alice), qber=n_err / medium_code.n_vars)
    assert out.syndromes_match.all()

    vkey = jax.random.PRNGKey(99)
    tags_bob = np.asarray(verification_tags(jnp.asarray(out.bits), vkey))
    tags_alice = np.asarray(verification_tags(jnp.asarray(alice), vkey))
    verified = (tags_bob == tags_alice).all(axis=1)
    assert verified.all()

    k_final = amplified_key_bits(medium_code.n_vars, rec.leak_bits)
    assert 0 < k_final < medium_code.n_vars - rec.leak_bits
    pkey = jax.random.PRNGKey(123)
    fk_bob = np.asarray(privacy_amplify(jnp.asarray(out.bits), pkey, k_final))
    fk_alice = np.asarray(privacy_amplify(jnp.asarray(alice), pkey, k_final))
    np.testing.assert_array_equal(fk_bob, fk_alice)  # identical final keys
    assert fk_bob.shape == (8, k_final)
