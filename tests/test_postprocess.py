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


def test_blocked_hash_matches_dense():
    """The streaming block-Toeplitz path (round 3) must equal the dense
    matmul bit-for-bit for the same seed — across block-boundary
    misalignments (n_in/n_out not multiples of the block sizes) and
    n_out > block_out."""
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(42)
    for n_in, n_out, bo in [
        (700, 300, 128),   # ragged both axes
        (512, 512, 512),   # exact single block
        (1000, 900, 256),  # multiple row blocks
        (64, 700, 256),    # n_out > n_in, block larger than dims
        (333, 1000, 64),   # many ragged row blocks
    ]:
        bits = rng.integers(0, 2, (3, n_in), dtype=np.uint8)
        dense = toeplitz_hash(bits, key, n_out, method="dense")
        # All streaming formulations (blocked / XOR-parity / per-diagonal,
        # the hardware A/B candidates in benchmarks/amplify_lab.py) must
        # be bit-identical to the dense matmul, so the lab winner can
        # become the production default without a numerics question.
        for method in ("blocked", "blocked-xor", "blocked-diag"):
            blocked = toeplitz_hash(bits, key, n_out, block_out=bo,
                                    method=method)
            np.testing.assert_array_equal(
                np.asarray(dense), np.asarray(blocked),
                err_msg=str((n_in, n_out, method)),
            )


def test_blocked_hash_large_frame():
    """Amplify a production-scale frame (the sizes the decoder itself
    serves, benchmarks/frame_scale.py): the dense T would be ~8 GB here
    and cannot exist; the streaming path must run and agree with a
    numpy GF(2) oracle on spot-checked output bits."""
    n_in = 1 << 17  # 131072
    n_out = 60_000
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(7)
    bits = rng.integers(0, 2, (2, n_in), dtype=np.uint8)
    out = np.asarray(toeplitz_hash(bits, key, n_out, method="blocked"))
    assert out.shape == (2, n_out)
    # 'auto' must resolve to a valid streaming formulation here (T is
    # ~8 GB dense) and agree with the explicit blocked path — guards the
    # _BLOCKED_DEFAULT flip when the hardware A/B picks a winner.
    from qkd_ldpc_tpu.postprocess import _BLOCKED_DEFAULT, _BLOCKED_KERNELS

    assert _BLOCKED_DEFAULT in _BLOCKED_KERNELS
    auto = np.asarray(toeplitz_hash(bits, key, n_out))
    np.testing.assert_array_equal(out, auto)
    # Oracle: y_i = parity(s[i - j + n_in - 1] * x_j) on a few rows.
    s = np.asarray(jax.random.bernoulli(key, 0.5, (n_in + n_out - 1,)))
    j = np.arange(n_in)
    for i in (0, 1, n_out // 2, n_out - 1):
        row = s[i - j + n_in - 1].astype(np.uint8)
        want = (row @ bits.T) & 1
        np.testing.assert_array_equal(out[:, i], want, err_msg=f"row {i}")
