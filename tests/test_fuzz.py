"""Differential and property-based robustness tests.

- The Python and native alist parsers must AGREE on every input: both
  accept (with bit-identical tensors) or both reject (any ValueError).
  Seeded mutation fuzzing over a valid file probes the decision boundary.
- Decoder invariants on random codes: a converged frame's decision
  syndrome equals the target; the channel flips exactly k positions.
"""

import numpy as np
import pytest

from qkd_ldpc_tpu.codes import make_code, write_alist
from qkd_ldpc_tpu.codes._native import native_available, read_alist_native
from qkd_ldpc_tpu.codes.alist import parse_alist


def _mutate(text: str, rng: np.random.Generator) -> str:
    lines = text.splitlines()
    op = rng.integers(0, 5)
    if op == 0 and len(lines) > 2:  # drop a random line
        del lines[rng.integers(0, len(lines))]
    elif op == 1:  # perturb a random integer token
        i = int(rng.integers(0, len(lines)))
        toks = lines[i].split()
        if toks:
            j = int(rng.integers(0, len(toks)))
            toks[j] = str(int(toks[j]) + int(rng.integers(-3, 4)))
            lines[i] = " ".join(toks)
    elif op == 2:  # duplicate a line
        i = int(rng.integers(0, len(lines)))
        lines.insert(i, lines[i])
    elif op == 3:  # truncate
        lines = lines[: rng.integers(1, len(lines))]
    else:  # swap two lines
        i, j = rng.integers(0, len(lines), 2)
        lines[i], lines[j] = lines[j], lines[i]
    return "\n".join(lines) + "\n"


@pytest.mark.skipif(not native_available(), reason="native library unavailable")
def test_parsers_agree_on_mutated_alists(tmp_path):
    base = make_code(n=48, m=25, dv=3, seed=3)
    path = tmp_path / "c.alist"
    write_alist(base, path)
    text = path.read_text()
    rng = np.random.default_rng(2024)

    agree_accept = agree_reject = 0
    for trial in range(200):
        mutated = _mutate(text, rng)
        p = tmp_path / f"m{trial}.alist"
        p.write_text(mutated)
        try:
            py_code = parse_alist(mutated, str(p))
            py_ok = True
        except ValueError:
            py_ok = False
        try:
            nat_code = read_alist_native(p)
            nat_ok = True
        except ValueError:
            nat_ok = False
        assert py_ok == nat_ok, (
            f"parsers disagree (python={'accept' if py_ok else 'reject'}, "
            f"native={'accept' if nat_ok else 'reject'}) on:\n{mutated}"
        )
        if py_ok:
            np.testing.assert_array_equal(py_code.chk_adj, nat_code.chk_adj)
            np.testing.assert_array_equal(py_code.var_slot, nat_code.var_slot)
            agree_accept += 1
        else:
            agree_reject += 1
    # the mutation mix must actually exercise both outcomes
    assert agree_accept > 5 and agree_reject > 50, (agree_accept, agree_reject)


def test_converged_frames_satisfy_syndrome_property():
    """For every converged frame, syndrome(decision) == target — across
    random codes, QBERs, and seeds."""
    import jax
    import jax.numpy as jnp

    from qkd_ldpc_tpu.channel.keys import make_trial_batch, num_errors_for
    from qkd_ldpc_tpu.decoder import DecodeOptions
    from qkd_ldpc_tpu.decoder.reconcile import reconcile
    from qkd_ldpc_tpu.decoder.syndrome import syndrome

    rng = np.random.default_rng(7)
    for _ in range(4):
        n = int(rng.integers(64, 300))
        m = int(rng.integers(n // 3, n // 2))
        code = make_code(n=n, m=m, dv=3, seed=int(rng.integers(1000)))
        q = float(rng.uniform(0.01, 0.09))
        ne = max(1, num_errors_for(n, q))
        alice, bob = make_trial_batch(
            jax.random.PRNGKey(int(rng.integers(1000))), n, 8,
            jnp.asarray(ne, jnp.int32),
        )
        res = reconcile(code, alice, bob, ne / n, DecodeOptions(max_iterations=60))
        target = np.asarray(syndrome(code, alice))
        got = np.asarray(syndrome(code, res.bits))
        ok = np.asarray(res.syndromes_match)
        assert np.array_equal(got[ok], target[ok]), (n, m, q)
        # keys_match implies syndromes_match (never the reverse claim)
        assert not np.any(np.asarray(res.keys_match) & ~ok)


def test_glued_sign_tokens_rejected_by_both_parsers(tmp_path):
    """A 75k-case differential fuzz found the native tokenizer accepting
    glued-sign tokens ("52+74" -> 52, 74 via strtol resume — also the
    reference's istringstream behavior) while the Python parser rejects
    them.  Both now enforce one integer per whitespace token —
    deliberately stricter than the reference, whose stream extraction
    can silently misparse corrupted files into a wrong graph."""
    from qkd_ldpc_tpu.codes import make_code, read_alist, write_alist

    code = make_code(n=48, m=25, dv=3, seed=5)
    p = tmp_path / "glue.alist"
    write_alist(code, str(p))
    text = p.read_text()
    # glue the first two adjacency numbers with a '+' sign
    lines = text.splitlines()
    toks = lines[4].split()
    assert len(toks) >= 2
    lines[4] = toks[0] + "+" + toks[1] + (" " + " ".join(toks[2:]) if toks[2:] else "")
    p.write_text("\n".join(lines) + "\n")
    for native in (True, False):
        with pytest.raises(ValueError):
            read_alist(str(p), native=native)
