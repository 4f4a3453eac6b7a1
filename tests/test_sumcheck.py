"""Sumcheck protocol tests ported from sumcheck/src/lib.rs:31-123 (BLS12-381 Fr)."""

import pytest

from zk_tpu.fields import BLS12_381_FR as FR, F17
from zk_tpu.poly import MLE, CoeffMultilinearPolynomial, ProductPoly, SumOfProducts
from zk_tpu.sumcheck import (
    SubClaim,
    SumcheckError,
    SumcheckProof,
    SumcheckProver,
    SumcheckVerifier,
)


def p_2ab_3bc():
    """sumcheck/src/lib.rs:40-51."""
    evaluations = CoeffMultilinearPolynomial.new(
        FR, 3, [(2, [True, True, False]), (3, [False, True, True])]
    ).to_evaluation_form()
    return MLE.new(FR, 3, evaluations)


def test_sumcheck_correct_sum_multilinear():
    # p = 2ab + 3bc, sum over hypercube = 10
    prod_poly = ProductPoly([p_2ab_3bc()])
    proof = SumcheckProver.prove(prod_poly, 10, max_var_degree=1)
    assert SumcheckVerifier.verify(prod_poly, proof)


def test_correct_sum_multivariate_deg_2():
    # p = 2a^2b + 3ab = (2a + 0b + 3) * (ab)
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
    p = ProductPoly([p1, p2])
    proof = SumcheckProver.prove(p, 5, max_var_degree=2)
    assert SumcheckVerifier.verify(p, proof)


def test_correct_sum_prove_partial():
    prod_poly = ProductPoly([p_2ab_3bc()])
    proof, _challenges = SumcheckProver.prove_partial(prod_poly, 10, max_var_degree=1)
    subclaim = SumcheckVerifier.verify_partial(FR, proof)
    expected_sum = prod_poly.evaluate(subclaim.challenges)
    assert expected_sum == subclaim.sum


def test_invalid_sum():
    prod_poly = ProductPoly([p_2ab_3bc()])
    proof = SumcheckProver.prove(prod_poly, 12, max_var_degree=1)
    with pytest.raises(SumcheckError):
        SumcheckVerifier.verify(prod_poly, proof)


def test_round_poly_count_check():
    prod_poly = ProductPoly([p_2ab_3bc()])
    proof = SumcheckProver.prove(prod_poly, 10, max_var_degree=1)
    bad = SumcheckProof(sum=proof.sum, round_polys=proof.round_polys[:-1])
    with pytest.raises(SumcheckError):
        SumcheckVerifier.verify(prod_poly, bad)


def test_prover_verifier_challenge_agreement():
    # prove_partial returns the prover's challenges; verify_partial must
    # derive the identical sequence from the transcript
    prod_poly = ProductPoly([p_2ab_3bc()])
    proof, prover_challenges = SumcheckProver.prove_partial(prod_poly, 10, max_var_degree=1)
    subclaim = SumcheckVerifier.verify_partial(FR, proof)
    assert subclaim.challenges == prover_challenges


def test_round_polys_match_bruteforce():
    # first round poly evaluated at 0 and 1 must sum the two half-tables
    poly = p_2ab_3bc()
    prod_poly = ProductPoly([poly])
    proof, _ = SumcheckProver.prove_partial(prod_poly, 10, max_var_degree=1)
    evals = poly.evaluation_ints()
    assert proof.round_polys[0][0] == sum(evals[:4]) % FR.p
    assert proof.round_polys[0][1] == sum(evals[4:]) % FR.p
    # p(0) + p(1) == claimed sum each round (the verifier's invariant)
    assert (proof.round_polys[0][0] + proof.round_polys[0][1]) % FR.p == 10


def test_sumcheck_small_field():
    # same protocol over F17 (mini-field fixture pattern, SURVEY.md §4.1)
    evals = CoeffMultilinearPolynomial.new(
        F17, 3, [(2, [True, True, False]), (3, [False, True, True])]
    ).to_evaluation_form()
    poly = MLE.new(F17, 3, evals)
    prod_poly = ProductPoly([poly])
    total = sum(evals) % 17
    proof = SumcheckProver.prove(prod_poly, total, max_var_degree=1)
    assert SumcheckVerifier.verify(prod_poly, proof)


def test_sumcheck_sum_of_products():
    # GKR-shaped input: A*B + C over F17, degree 2
    a = MLE.new(F17, 2, [2, 8, 10, 14])
    b = MLE.new(F17, 2, [2, 8, 10, 22])
    c = MLE.new(F17, 2, [1, 2, 3, 4])
    sp = SumOfProducts([ProductPoly([a, b]), ProductPoly([c])])
    total = 0
    for x, y, z in zip(a.evaluation_ints(), b.evaluation_ints(), c.evaluation_ints()):
        total = F17.add(total, F17.add(F17.mul(x, y), z))
    proof, _ = SumcheckProver.prove_partial(sp, total, max_var_degree=2)
    subclaim = SumcheckVerifier.verify_partial(F17, proof)
    assert sp.evaluate(subclaim.challenges) == subclaim.sum


def test_wrong_sum_partial_fails():
    prod_poly = ProductPoly([p_2ab_3bc()])
    proof, _ = SumcheckProver.prove_partial(prod_poly, 11, max_var_degree=1)
    with pytest.raises(SumcheckError):
        SumcheckVerifier.verify_partial(FR, proof)


def test_tier_equivalence_host_vs_jnp():
    # host-int tail tier and fused jnp tier must emit identical proofs
    prod_poly = ProductPoly([p_2ab_3bc()])
    proof_host, ch_host = SumcheckProver.prove_partial(prod_poly, 10, max_var_degree=1)
    proof_jnp, ch_jnp = SumcheckProver.prove_partial(
        prod_poly, 10, max_var_degree=1, tail_size=0
    )
    assert proof_host.round_polys == proof_jnp.round_polys
    assert ch_host == ch_jnp


def test_tier_equivalence_sum_of_products():
    a = MLE.new(F17, 3, [2, 8, 10, 14, 1, 5, 9, 11])
    b = MLE.new(F17, 3, [2, 8, 10, 22, 4, 0, 3, 7])
    c = MLE.new(F17, 3, [1, 2, 3, 4, 5, 6, 7, 8])
    sp = SumOfProducts([ProductPoly([a, b]), ProductPoly([c])])
    total = 0
    for x, y, z in zip(a.evaluation_ints(), b.evaluation_ints(), c.evaluation_ints()):
        total = F17.add(total, F17.add(F17.mul(x, y), z))
    ph, _ = SumcheckProver.prove_partial(sp, total, max_var_degree=2)
    pj, _ = SumcheckProver.prove_partial(sp, total, max_var_degree=2, tail_size=0)
    assert ph.round_polys == pj.round_polys
    subclaim = SumcheckVerifier.verify_partial(F17, ph)
    assert sp.evaluate(subclaim.challenges) == subclaim.sum


def test_proof_serialization_roundtrip():
    from zk_tpu.sumcheck import proof_from_bytes, proof_to_bytes

    prod_poly = ProductPoly([p_2ab_3bc()])
    proof = SumcheckProver.prove(prod_poly, 10, max_var_degree=1)
    blob = proof_to_bytes(FR, proof)
    back = proof_from_bytes(FR, blob)
    assert back.sum == proof.sum
    assert back.round_polys == proof.round_polys
    assert SumcheckVerifier.verify(prod_poly, back)
    with pytest.raises(ValueError):
        proof_from_bytes(FR, blob + b"\x00")
