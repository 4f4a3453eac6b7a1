"""Device limb/Montgomery arithmetic differential-tested against host ints."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from zk_tpu.fields import ALL_FIELDS, BLS12_381_FR, F17
from zk_tpu.fields import device as dev


def _rand_ints(f, n, seed):
    rng = random.Random(seed)
    return [rng.randrange(f.p) for _ in range(n)]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_encode_decode_roundtrip(f):
    vals = _rand_ints(f, 37, 1) + [0, 1, f.p - 1]
    arr = dev.encode_ints(f, vals)
    assert arr.shape == (f.n_limbs, len(vals))
    assert arr.dtype == jnp.uint32
    assert dev.decode_ints(f, arr) == [v % f.p for v in vals]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(f):
    n = 64
    a_i = _rand_ints(f, n, 2)
    b_i = _rand_ints(f, n, 3)
    # include edge cases
    a_i[:3] = [0, f.p - 1, f.p - 1]
    b_i[:3] = [0, f.p - 1, 1]
    a = dev.encode_ints(f, a_i)
    b = dev.encode_ints(f, b_i)
    assert dev.decode_ints(f, dev.add_mod(f, a, b)) == [f.add(x, y) for x, y in zip(a_i, b_i)]
    assert dev.decode_ints(f, dev.sub_mod(f, a, b)) == [f.sub(x, y) for x, y in zip(a_i, b_i)]
    assert dev.decode_ints(f, dev.sub_mod(f, b, a)) == [f.sub(y, x) for x, y in zip(a_i, b_i)]
    assert dev.decode_ints(f, dev.neg_mod(f, a)) == [f.neg(x) for x in a_i]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_mont_mul(f):
    n = 64
    a_i = _rand_ints(f, n, 4)
    b_i = _rand_ints(f, n, 5)
    a_i[:4] = [0, 1, f.p - 1, f.p - 1]
    b_i[:4] = [f.p - 1, f.p - 1, f.p - 1, 1]
    a = dev.encode_ints(f, a_i)
    b = dev.encode_ints(f, b_i)
    got = dev.decode_ints(f, dev.mont_mul(f, a, b))
    assert got == [f.mul(x, y) for x, y in zip(a_i, b_i)]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_mont_mul_scalar_broadcast(f):
    n = 16
    a_i = _rand_ints(f, n, 6)
    r = _rand_ints(f, 1, 7)[0]
    a = dev.encode_ints(f, a_i)
    r_dev = dev.encode_ints(f, [r])  # (L, 1)
    got = dev.decode_ints(f, dev.mont_mul(f, a, r_dev))
    assert got == [f.mul(x, r) for x in a_i]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_lerp_matches_reference_fold(f):
    # left - r*(left - right)  (evaluation_form.rs:68)
    n = 32
    l_i = _rand_ints(f, n, 8)
    r_i = _rand_ints(f, n, 9)
    c = _rand_ints(f, 1, 10)[0]
    left = dev.encode_ints(f, l_i)
    right = dev.encode_ints(f, r_i)
    c_dev = dev.encode_ints(f, [c])
    got = dev.decode_ints(f, dev.lerp(f, left, right, c_dev))
    want = [f.sub(x, f.mul(c, f.sub(x, y))) for x, y in zip(l_i, r_i)]
    assert got == want


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_sum_mod(f):
    for n in (1, 2, 8, 33, 128):
        vals = _rand_ints(f, n, 100 + n)
        arr = dev.encode_ints(f, vals)
        got = dev.decode_ints(f, dev.sum_mod(f, arr, axis=-1).reshape(f.n_limbs, 1))
        assert got == [sum(vals) % f.p]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_mont_conversions(f):
    vals = _rand_ints(f, 20, 11)
    canon = dev.encode_ints(f, vals, mont=False)
    m = dev.to_mont(f, canon)
    assert dev.decode_ints(f, m, mont=True) == vals
    back = dev.from_mont(f, m)
    assert dev.decode_ints(f, back, mont=False) == vals


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_bytes_roundtrip_matches_host_serialization(f):
    vals = _rand_ints(f, 25, 12) + [0, 1, f.p - 1]
    arr = dev.encode_ints(f, vals)
    blob = dev.decode_bytes_be(f, arr)
    # must equal arkworks-style concat of canonical BE bytes
    assert blob == f.elements_to_bytes(vals)
    back = dev.encode_bytes_be(f, blob)
    assert dev.decode_ints(f, back) == vals


def test_f17_hand_checked():
    # mod-17 arithmetic checkable by hand
    a = dev.encode_ints(F17, [5, 16, 0, 9])
    b = dev.encode_ints(F17, [13, 16, 7, 9])
    assert dev.decode_ints(F17, dev.add_mod(F17, a, b)) == [1, 15, 7, 1]
    assert dev.decode_ints(F17, dev.mont_mul(F17, a, b)) == [14, 1, 0, 13]
    assert dev.decode_ints(F17, dev.sub_mod(F17, a, b)) == [9, 0, 10, 0]


def test_jit_and_grad_free_composition():
    # ops must compose under jit with the Field static
    import jax

    f = BLS12_381_FR

    @jax.jit
    def round_step(tbl, r):
        n = tbl.shape[1]
        left, right = tbl[:, : n // 2], tbl[:, n // 2 :]
        folded = dev.lerp(f, left, right, r)
        return dev.sum_mod(f, folded, axis=-1)

    vals = _rand_ints(f, 16, 13)
    r = _rand_ints(f, 1, 14)[0]
    tbl = dev.encode_ints(f, vals)
    out = round_step(tbl, dev.encode_ints(f, [r]))
    want = 0
    for x, y in zip(vals[:8], vals[8:]):
        want = (want + x - r * (x - y)) % f.p
    assert dev.decode_ints(f, out.reshape(f.n_limbs, 1)) == [want]
