"""Coefficient-form MLE tests ported from coefficient_form.rs:525-1348 (F17)."""

import pytest

from zk_tpu.fields import F17
from zk_tpu.poly import CoeffMultilinearPolynomial as CM
from zk_tpu.poly.coeff_mle import (
    mapping_instruction_from_variable_presence,
    selector_to_index,
    _to_power_of_two,
)


def map_from_vec(values):
    """fq_map_from_vec analog: dense vec -> sparse map, zeros dropped."""
    return {i: v % 17 for i, v in enumerate(values) if v % 17 != 0}


def poly_5ab_7bc_8d():
    return CM.new(
        F17,
        4,
        [
            (5, [True, True, False, False]),
            (7, [False, True, True, False]),
            (8, [False, False, False, True]),
        ],
    )


def test_polynomial_instantiation():
    assert CM.new(F17, 2, [(2, [True, True])]).coefficients == {3: 2}
    assert CM.new(
        F17, 2, [(2, [True, False]), (3, [False, True]), (5, [True, True])]
    ).coefficients == {1: 2, 2: 3, 3: 5}
    assert CM.new(F17, 2, [(5, [False, False])]).coefficients == {0: 5}
    # simplification: 2ab + 3ab + 4b = 5ab + 4b
    assert CM.new(
        F17, 2, [(2, [True, True]), (3, [True, True]), (4, [False, True])]
    ).coefficients == {2: 4, 3: 5}


def test_instantiation_invalid_variables():
    with pytest.raises(ValueError):
        CM.new(F17, 3, [(2, [True, True])])


def test_selector_to_index():
    assert selector_to_index([False, False, False, False]) == 0
    assert selector_to_index([True, False, False, False]) == 1
    assert selector_to_index([False, True, False, False]) == 2
    assert selector_to_index([True, True, False, True]) == 11


def test_get_variable_indexes():
    with pytest.raises(ValueError):
        CM.get_variable_indexes(4, [False, False, False, False])
    with pytest.raises(ValueError):
        CM.get_variable_indexes(4, [True, False, True, False])
    assert CM.get_variable_indexes(4, [True, False, False, False]) == [1, 3, 5, 7, 9, 11, 13, 15]
    assert CM.get_variable_indexes(4, [False, True, False, False]) == [2, 3, 6, 7, 10, 11, 14, 15]
    assert CM.get_variable_indexes(4, [False, False, True, False]) == [4, 5, 6, 7, 12, 13, 14, 15]
    assert CM.get_variable_indexes(4, [False, False, False, True]) == [8, 9, 10, 11, 12, 13, 14, 15]


def test_empty_partial_evaluation():
    p = poly_5ab_7bc_8d()
    assert p.partial_evaluate([]) == p


def test_partial_eval_happy_path():
    # b=3, a=2: p -> 13 + 4c + 8d
    p = poly_5ab_7bc_8d().partial_evaluate(
        [([False, True, False, False], 3), ([True, False, False, False], 2)]
    )
    assert p.coefficients == map_from_vec([13, 0, 0, 0, 4, 0, 0, 0, 8])
    # c=2: -> 4 + 8d
    q = p.partial_evaluate([([False, False, True, False], 2)])
    assert q.coefficients == map_from_vec([4, 0, 0, 0, 0, 0, 0, 0, 8])


def test_partial_eval_assign_all():
    ev = poly_5ab_7bc_8d().partial_evaluate(
        [
            ([True, False, False, False], 2),
            ([False, True, False, False], 4),
            ([False, False, True, False], 3),
            ([False, False, False, True], 5),
        ]
    )
    assert ev.coefficients == {0: 11}


def test_partial_eval_repeated_assignment():
    # second a assignment has no effect
    ev = poly_5ab_7bc_8d().partial_evaluate(
        [
            ([True, False, False, False], 2),
            ([True, False, False, False], 3),
            ([False, True, False, False], 4),
            ([False, False, True, False], 3),
            ([False, False, False, True], 5),
        ]
    )
    assert ev.coefficients == {0: 11}


def test_partial_eval_ignore_larger_selector():
    p = poly_5ab_7bc_8d()
    ev = p.partial_evaluate([([True, False, False, False, False], 3)])
    assert ev.coefficients == p.coefficients


def test_evaluation_incomplete_assignment():
    with pytest.raises(ValueError):
        poly_5ab_7bc_8d().evaluate_slice([4])


def test_evaluation_happy_path():
    assert poly_5ab_7bc_8d().evaluate_slice([2, 4, 3, 5]) == 11


def test_evaluation_with_more_than_n_points():
    assert poly_5ab_7bc_8d().evaluate_slice([2, 4, 3, 5, 8]) == 11


def test_polynomial_addition():
    s = poly_5ab_7bc_8d() + poly_5ab_7bc_8d()
    assert s.coefficients == map_from_vec([0, 0, 0, 10, 0, 0, 14, 0, 16])


def test_scalar_multiplication():
    two_p = poly_5ab_7bc_8d().scalar_multiply(2)
    assert two_p.coefficients == map_from_vec([0, 0, 0, 10, 0, 0, 14, 0, 16])
    scalar_poly = CM.new(F17, 0, [(2, [])])
    assert (poly_5ab_7bc_8d() * scalar_poly).coefficients == map_from_vec(
        [0, 0, 0, 10, 0, 0, 14, 0, 16]
    )


def test_multilinear_poly_multiplication():
    # 5ab * 6c = 30abc
    p = CM.new(F17, 2, [(5, [True, True])])
    q = CM.new(F17, 1, [(6, [True])])
    pq = p * q
    assert pq.n_vars == 3
    assert pq.coefficients == {7: 30 % 17}

    # (3ac + 2ab) * 7de
    p = CM.new(F17, 3, [(3, [True, False, True]), (2, [True, True, False])])
    q = CM.new(F17, 2, [(7, [True, True])])
    pq = p * q
    assert pq.n_vars == 5
    assert pq.coefficients == {27: 14, 29: 21 % 17}


def test_crazy_multilinear_poly_multiplication():
    p = CM.new(
        F17,
        4,
        [(2, [True, False, False, False]), (3, [False, True, True, False]), (6, [False, False, False, True])],
    )
    q = CM.new(
        F17,
        4,
        [(4, [True, False, False, False]), (5, [False, True, True, False]), (2, [False, False, False, True])],
    )
    pq = p * q
    assert pq.n_vars == 8
    expected = [0] * 256
    expected[17] = 8
    expected[97] = 10
    expected[129] = 4
    expected[22] = 12
    expected[102] = 15
    expected[134] = 6
    expected[24] = 24
    expected[104] = 30
    expected[136] = 12
    assert pq.coefficients == map_from_vec(expected)


def test_3_multilinear_multiplication():
    p = CM.new(F17, 2, [(2, [True, False]), (3, [False, True])])
    q = CM.new(F17, 1, [(4, [True])])
    r = CM.new(F17, 1, [(5, [True])])
    result = (p * q) * r
    assert result.coefficients == map_from_vec(
        [0] * 13 + [40, 60, 0]
    )


def test_identities():
    p = poly_5ab_7bc_8d()
    assert p * CM.multiplicative_identity(F17) == p
    assert (p + CM.additive_identity(F17)) == p


def test_check_zero():
    z = CM.check_zero(F17)
    assert z.evaluate_slice([0]) == 1
    assert z.evaluate_slice([1]) == 0
    assert z.evaluate_slice([5]) == (17 - 4)


def test_check_one():
    o = CM.check_one(F17)
    assert o.evaluate_slice([0]) == 0
    assert o.evaluate_slice([1]) == 1
    assert o.evaluate_slice([20]) == 20 % 17


def test_lagrange_basis_polynomial():
    # checker for 101 (5), 3 variables
    five = CM.lagrange_basis_poly(F17, 5, 3)
    assert five.n_vars == 3
    for i, point in enumerate(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1], [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
    ):
        assert five.evaluate_slice(point) == (1 if i == 5 else 0)


def test_interpolation():
    # y = [2, 4, 8, 3] -> p(a,b) = 2 + 6a + 2b - 7ab
    p = CM.interpolate(F17, [2, 4, 8, 3])
    assert p.n_vars == 2
    assert {k: v for k, v in p.coefficients.items() if v != 0} == {
        0: 2,
        1: 6,
        2: 2,
        3: (-7) % 17,
    }
    assert p.evaluate_slice([0, 0]) == 2
    assert p.evaluate_slice([0, 1]) == 4
    assert p.evaluate_slice([1, 0]) == 8
    assert p.evaluate_slice([1, 1]) == 3


def test_variable_presence_vector():
    p = CM.new(F17, 3, [(3, [True, False, False]), (2, [False, False, True])])
    assert p.variable_presence_vector() == [True, False, True]


def test_mapping_instruction_from_variable_presence():
    assert mapping_instruction_from_variable_presence([True, False, False, True]) == [(3, 1)]
    assert mapping_instruction_from_variable_presence([True, False, False, True, True]) == [
        (3, 1),
        (4, 2),
    ]
    assert mapping_instruction_from_variable_presence([False, False, True, True]) == [
        (2, 0),
        (3, 1),
    ]
    assert mapping_instruction_from_variable_presence([True, True]) == []
    assert mapping_instruction_from_variable_presence([False, False]) == []
    assert _to_power_of_two(
        mapping_instruction_from_variable_presence([False, True, False, False, True, False])
    ) == [(2, 1), (16, 2)]


def test_poly_relabelling():
    p = CM.new(
        F17,
        4,
        [
            (2, [True, True, False, False]),
            (3, [False, False, True, True]),
            (5, [True, False, True, True]),
            (6, [False, True, False, True]),
        ],
    )
    q = p.partial_evaluate(
        [([False, True, False, False], 1), ([False, False, True, False], 1)]
    )
    assert q.n_vars == 4
    assert {k: v for k, v in q.coefficients.items() if v != 0} == {1: 2, 8: 9, 9: 5}
    q = q.relabel()
    assert q.n_vars == 2
    assert {k: v for k, v in q.coefficients.items() if v != 0} == {1: 2, 2: 9, 3: 5}

    # constant poly: relabel is a no-op
    c = CM.multiplicative_identity(F17)
    assert c.relabel() == c


def test_bit_string_checker():
    checker = CM.bit_string_checker(F17, "001")
    for i, point in enumerate(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1], [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
    ):
        assert checker.evaluate_slice(point) == (1 if i == 1 else 0)


def test_evaluate_zero_poly():
    assert CM.additive_identity(F17).evaluate_slice([]) == 0


def test_to_univariate():
    p = CM.new(F17, 1, [(2, [True])])
    assert p.evaluate_slice([2]) == 4
    assert p.to_univariate().evaluate(2) == 4

    p = CM.new(F17, 1, [(3, [True]), (4, [False])])
    assert p.evaluate_slice([3]) == 13
    assert p.to_univariate().evaluate(3) == 13

    p = CM.additive_identity(F17)
    assert p.to_univariate().evaluate(25) == 0

    with pytest.raises(ValueError):
        poly_5ab_7bc_8d().to_univariate()


def test_to_evaluation_form():
    # p = 2ab + 3bc -> [0, 0, 0, 3, 0, 0, 2, 5]
    p = CM.new(F17, 3, [(2, [True, True, False]), (3, [False, True, True])])
    assert p.to_evaluation_form() == [0, 0, 0, 3, 0, 0, 2, 5]


def test_to_bytes_layout():
    # n_vars u32 BE + (key u64 BE + coeff BE) per entry, keys ascending
    p = CM.new(F17, 2, [(2, [True, False]), (3, [False, True])])
    blob = p.to_bytes()
    assert blob[:4] == (2).to_bytes(4, "big")
    assert blob[4:12] == (1).to_bytes(8, "big")
    assert blob[12:20] == F17.to_bytes_be(2)
    assert blob[20:28] == (2).to_bytes(8, "big")
    assert blob[28:36] == F17.to_bytes_be(3)


def test_multiplicative_identity():
    """coefficient_form.rs test_multiplicative_identity."""
    p = poly_5ab_7bc_8d()
    mult_identity = CM.multiplicative_identity(F17)
    r = p * mult_identity
    assert r.n_vars == p.n_vars and r.coefficients == p.coefficients


def test_additive_identity():
    """coefficient_form.rs test_additive_identity."""
    p = poly_5ab_7bc_8d()
    add_identity = CM.additive_identity(F17)
    r = p + add_identity
    assert r.n_vars == p.n_vars and r.coefficients == p.coefficients
