"""Shared test fixtures: small textbook parity-check matrices.

H_JOHNSON is the regular (3,6)-style toy matrix of Example 2.5 (p. 33) of
S. Johnson, *Introducing Low-Density Parity-Check Codes* — the same example
the reference uses as its executable golden walkthrough
(``example/qkd_ldpc_example.cpp:34-39``).

H_HAMMING74 is the standard Hamming(7,4) parity-check matrix.

H_N10 is a small irregular matrix exercising the masked-irregular decode
path (column weights vary between 2 and 3).
"""

H_JOHNSON = [
    [1, 1, 0, 1, 0, 0],
    [0, 1, 1, 0, 1, 0],
    [1, 0, 0, 0, 1, 1],
    [0, 0, 1, 1, 0, 1],
]

# Johnson ex. 2.5 keys: Alice's codeword and Bob's copy with bit 0 flipped
# (QBER nominal 0.2), as exercised by the reference example program.
JOHNSON_ALICE = [0, 0, 1, 0, 1, 1]
JOHNSON_BOB = [1, 0, 1, 0, 1, 1]
JOHNSON_QBER = 0.2

H_HAMMING74 = [
    [1, 0, 1, 0, 1, 0, 1],
    [0, 1, 1, 0, 0, 1, 1],
    [0, 0, 0, 1, 1, 1, 1],
]

H_N10 = [
    [1, 1, 0, 1, 1, 0, 0, 1, 0, 0],
    [0, 1, 1, 0, 1, 1, 1, 0, 0, 0],
    [0, 0, 0, 1, 0, 0, 0, 1, 1, 1],
    [1, 1, 0, 0, 0, 1, 1, 0, 1, 0],
    [0, 0, 1, 0, 0, 1, 0, 1, 0, 1],
]

# Path to the read-only reference checkout (parity tests are skipped when
# it is absent so the repo stands alone).
REFERENCE_DIR = "/root/reference"
REFERENCE_ALIST = (
    REFERENCE_DIR + "/alist_sparse_matrices/(N=10240,M=5231,R=0.49,CW=3,SEED=666).txt"
)
