"""Device MLE + ProductPoly tests ported from evaluation_form.rs:106-203,
product_poly.rs:91-197, boolean_hypercube.rs:47-105 (BLS12-381 Fr)."""

import pytest

from zk_tpu.fields import BLS12_381_FR as FR, F17
from zk_tpu.poly import MLE, BooleanHyperCube, CoeffMultilinearPolynomial, ProductPoly, SumOfProducts


def test_boolean_hypercube_iteration():
    two = list(BooleanHyperCube(2))
    assert two == [[0, 0], [0, 1], [1, 0], [1, 1]]
    three = list(BooleanHyperCube(3))
    assert three[0] == [0, 0, 0]
    assert three[-1] == [1, 1, 1]
    assert len(three) == 8
    assert list(BooleanHyperCube(0)) == []


def test_new_multilinear_poly_validation():
    with pytest.raises(ValueError):
        MLE.new(FR, 2, [3, 1, 2])
    with pytest.raises(ValueError):
        MLE.new(FR, 2, [3, 1])
    MLE.new(FR, 1, [3, 1])
    MLE.new(FR, 2, [3, 1, 2, 5])


def test_partial_evaluate_single_variable():
    poly = MLE.new(FR, 2, [3, 1, 2, 5])
    got = poly.partial_evaluate(0, [5]).evaluation_ints()
    assert got == [(-2) % FR.p, 21]
    # assigning 0 selects the first half
    assert poly.partial_evaluate(0, [0]).evaluation_ints() == [3, 1]
    # assigning 1 selects the second half
    assert poly.partial_evaluate(0, [1]).evaluation_ints() == [2, 5]


def test_partial_evaluate_consecutive_variables():
    # f(a, b, c) = 2ab + 3bc
    poly = MLE.new(FR, 3, [0, 0, 0, 3, 0, 0, 2, 5])
    got = poly.partial_evaluate(1, [2, 3])
    assert got.n_vars == 1
    assert got.evaluation_ints() == [18, 22]


def test_full_evaluation():
    poly = MLE.new(FR, 3, [0, 0, 0, 3, 0, 0, 2, 5])
    assert poly.evaluate([2, 3, 4]) == 48


def test_evaluate_wrong_arity():
    poly = MLE.new(FR, 2, [3, 1, 2, 5])
    with pytest.raises(ValueError):
        poly.evaluate([1])


def test_cross_representation_consistency():
    # sparse coefficient form -> dense evaluation form -> same evaluations
    # (the reference's sumcheck test pattern, sumcheck/src/lib.rs:40-51)
    p = CoeffMultilinearPolynomial.new(
        F17, 3, [(2, [True, True, False]), (3, [False, True, True])]
    )
    mle = MLE.from_coeff(p)
    assert mle.evaluation_ints() == [0, 0, 0, 3, 0, 0, 2, 5]
    # both representations agree at non-boolean points
    assert mle.evaluate([2, 3, 4]) == p.evaluate_slice([2, 3, 4])


def test_to_bytes_matches_host():
    vals = [3, 1, 2, 5]
    poly = MLE.new(FR, 2, vals)
    assert poly.to_bytes() == FR.elements_to_bytes(vals)


def test_product_poly_creation():
    a = MLE.new(FR, 2, [2, 8, 10, 14])
    b = MLE.new(FR, 2, [2, 8, 10, 22])
    ProductPoly([a, b])
    c = MLE.new(FR, 1, [2, 8])
    with pytest.raises(ValueError):
        ProductPoly([c, b])
    with pytest.raises(ValueError):
        ProductPoly([])


def test_product_poly_evaluate():
    a = MLE.new(FR, 2, [2, 8, 10, 14])
    b = MLE.new(FR, 2, [2, 8, 10, 22])
    c = MLE.new(FR, 2, [2, 8, 10, 22])
    direct = 1
    for m in (a, b, c):
        direct = FR.mul(direct, m.evaluate([1, 10]))
    pp = ProductPoly([a, b, c])
    assert pp.evaluate([1, 10]) == direct


def test_product_poly_wrong_arity():
    a = MLE.new(FR, 2, [2, 8, 10, 14])
    pp = ProductPoly([a])
    with pytest.raises(ValueError):
        pp.evaluate([1])


def test_product_poly_partial_evaluate():
    a = MLE.new(FR, 2, [2, 8, 10, 14])
    b = MLE.new(FR, 2, [2, 8, 10, 22])
    pp = ProductPoly([a, b])
    expected = ProductPoly(
        [a.partial_evaluate(1, [10]), b.partial_evaluate(1, [10])]
    )
    assert pp.partial_evaluate(1, [10]) == expected


def test_prod_reduce():
    a = MLE.new(FR, 2, [2, 8, 10, 14])
    b = MLE.new(FR, 2, [2, 8, 10, 22])
    pp = ProductPoly([a, b])
    assert pp.prod_reduce_ints() == [4, 64, 100, 308]


def test_sum_of_products():
    a = MLE.new(F17, 2, [2, 8, 10, 14])
    b = MLE.new(F17, 2, [2, 8, 10, 22])
    c = MLE.new(F17, 2, [1, 2, 3, 4])
    sp = SumOfProducts([ProductPoly([a, b]), ProductPoly([c])])
    assert sp.max_degree == 2
    # evaluate = A*B + C at a point
    pt = [3, 5]
    want = F17.add(F17.mul(a.evaluate(pt), b.evaluate(pt)), c.evaluate(pt))
    assert sp.evaluate(pt) == want
    # sum_reduce elementwise
    import numpy as np

    from zk_tpu.fields import device as dev

    got = dev.decode_ints(F17, sp.sum_reduce())
    want_tbl = [
        F17.add(F17.mul(x, y), z)
        for x, y, z in zip(
            a.evaluation_ints(), b.evaluation_ints(), c.evaluation_ints()
        )
    ]
    assert got == want_tbl


def test_pairing_index_parity():
    # ported from pairing_index.rs:28-98
    from zk_tpu.poly.pairing_index import index_pair, insert_bit, mask

    val = 0b10101
    assert insert_bit(val, 0, 0) == 0b101010
    assert insert_bit(val, 0, 1) == 0b101011
    assert insert_bit(val, 5, 0) == 0b010101
    assert insert_bit(val, 5, 1) == 0b110101
    assert insert_bit(0b10, 1, 0) == 0b100
    assert insert_bit(0b10, 1, 1) == 0b110
    assert mask(1) == 0b1 and mask(3) == 0b111

    assert list(index_pair(3, 0)) == [(0, 4), (1, 5), (2, 6), (3, 7)]
    assert list(index_pair(3, 1)) == [(0, 2), (1, 3), (4, 6), (5, 7)]
    assert list(index_pair(3, 2)) == [(0, 1), (2, 3), (4, 5), (6, 7)]
    assert list(index_pair(2, 0)) == [(0, 2), (1, 3)]
    assert list(index_pair(2, 1)) == [(0, 1), (2, 3)]
    assert list(index_pair(1, 0)) == [(0, 1)]
