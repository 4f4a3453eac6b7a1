"""Frozen golden vectors: any serialization or transcript drift fails here.

The north star requires bit-exactness with the Rust reference
(BASELINE.json:5).  The exactness boundary is canonical BE bytes
(arkworks ``into_bigint().to_bytes_be()`` — evaluation_form.rs:97-103,
sumcheck/src/lib.rs:23-29) and the reset-and-reseed Keccak-256
transcript (transcript/src/lib.rs:20-30).  tests/goldens/ freezes the
current proof bytes + challenge sequences for the reference's sumcheck
cases (sumcheck/src/lib.rs:31-123) and a GKR case; this module
re-proves them and asserts byte equality, plus hand-computed
arkworks-semantics KATs that don't depend on our own code paths.

Regenerate (only after an INTENDED format change):
``python tests/goldens/generate.py``.
"""

import json
import os
import random

from zk_tpu.fields import BLS12_381_FR as FR, GOLDILOCKS
from zk_tpu.gkr import GKRProver, gkr_proof_to_bytes
from zk_tpu.poly import CoeffMultilinearPolynomial, MLE, ProductPoly
from zk_tpu.sumcheck import SumcheckProver, proof_from_bytes, proof_to_bytes
from zk_tpu.transcript import Transcript

from test_gkr import random_circuit

HERE = os.path.join(os.path.dirname(__file__), "goldens")


def _golden(name: str) -> bytes:
    with open(os.path.join(HERE, name), "rb") as f:
        return f.read()


def _p_2ab_3bc():
    evals = CoeffMultilinearPolynomial.new(
        FR, 3, [(2, [True, True, False]), (3, [False, True, True])]
    ).to_evaluation_form()
    return ProductPoly([MLE.new(FR, 3, evals)])


def test_sumcheck_prove_bytes_frozen():
    proof = SumcheckProver.prove(_p_2ab_3bc(), 10, max_var_degree=1)
    assert proof_to_bytes(FR, proof) == _golden("sumcheck_2ab3bc_prove.bin")


def test_sumcheck_partial_bytes_and_challenges_frozen():
    proof, challenges = SumcheckProver.prove_partial(
        _p_2ab_3bc(), 10, max_var_degree=1
    )
    assert proof_to_bytes(FR, proof) == _golden("sumcheck_2ab3bc_partial.bin")
    want = json.load(open(os.path.join(HERE, "challenges.json")))
    assert [hex(c) for c in challenges] == want["partial_challenges"]


def test_sumcheck_deg2_bytes_frozen():
    p1 = MLE.new(
        FR,
        2,
        CoeffMultilinearPolynomial.new(
            FR, 2, [(2, [True, False]), (0, [False, True]), (3, [False, False])]
        ).to_evaluation_form(),
    )
    p2 = MLE.new(
        FR,
        2,
        CoeffMultilinearPolynomial.new(FR, 2, [(1, [True, True])]).to_evaluation_form(),
    )
    proof = SumcheckProver.prove(ProductPoly([p1, p2]), 5, max_var_degree=2)
    assert proof_to_bytes(FR, proof) == _golden("sumcheck_deg2_prove.bin")


def test_sumcheck_wrong_sum_bytes_frozen():
    proof = SumcheckProver.prove(_p_2ab_3bc(), 12, max_var_degree=1)
    assert proof_to_bytes(FR, proof) == _golden("sumcheck_wrong_sum_prove.bin")


def test_proof_bytes_roundtrip_golden():
    data = _golden("sumcheck_2ab3bc_prove.bin")
    assert proof_to_bytes(FR, proof_from_bytes(FR, data)) == data


def test_gkr_proof_bytes_frozen():
    rng = random.Random(7)
    c = random_circuit(rng, depth=3, width=8, n_inputs=8)
    inputs = [rng.randrange(FR.p) for _ in range(8)]
    proof, _ = GKRProver.prove(FR, c, inputs)
    assert gkr_proof_to_bytes(FR, proof) == _golden("gkr_d3w8_prove.bin")


# ---------------------------------------------------------------------------
# hand-computed arkworks-semantics KATs (independent of our code paths)
# ---------------------------------------------------------------------------


def test_to_bytes_be_widths_and_values():
    # arkworks BigInt<N> with 64-bit limbs: 255-bit Fr pads to 32 bytes,
    # 64-bit Goldilocks to 8
    assert FR.n_bytes == 32
    assert GOLDILOCKS.n_bytes == 8
    assert FR.to_bytes_be(1) == b"\x00" * 31 + b"\x01"
    assert FR.to_bytes_be(0x0102) == b"\x00" * 30 + b"\x01\x02"
    assert GOLDILOCKS.to_bytes_be(GOLDILOCKS.p - 1) == bytes.fromhex(
        "ffffffff00000000"
    )


def test_from_be_bytes_mod_order_kats():
    # (2^256 - 1) mod p, precomputed by bigint arithmetic
    assert FR.from_be_bytes_mod_order(b"\xff" * 32) == int(
        "0x1824b159acc5056f998c4fefecbc4ff55884b7fa0003480200000001fffffffd", 16
    )
    assert GOLDILOCKS.from_be_bytes_mod_order(b"\xff" * 32) == 0xFFFFFFFE
    assert FR.from_be_bytes_mod_order(b"\x00" * 31 + b"\x07") == 7


def test_keccak_empty_anchor():
    # Keccak-256("") with original 0x01 multi-rate padding (NOT SHA3 0x06)
    from zk_tpu.transcript.keccak import Keccak256

    assert (
        Keccak256().digest().hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_transcript_first_challenge_is_digest_chain():
    # sample = keccak(absorbed); the digest is re-absorbed so the next
    # challenge hashes digest||new data (transcript/src/lib.rs:20-25)
    from zk_tpu.transcript.keccak import Keccak256

    t = Transcript()
    t.append(b"abc")
    ch = t.sample_field_element(FR)
    k = Keccak256()
    k.update(b"abc")
    d = k.digest()
    assert ch == FR.from_be_bytes_mod_order(d)
    ch2 = t.sample_field_element(FR)
    k2 = Keccak256()
    k2.update(d)
    assert ch2 == FR.from_be_bytes_mod_order(k2.digest())
