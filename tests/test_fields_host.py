"""Host-tier field arithmetic + serialization golden tests."""

import random

import pytest

from zk_tpu.fields import ALL_FIELDS, BLS12_377_FR, BLS12_381_FR, F17, GOLDILOCKS


def test_limb_counts_and_byte_widths():
    # arkworks BigInt widths: Fp64 -> 8 bytes, 255/253-bit -> 32 bytes
    assert F17.n_bytes == 8 and F17.n_limbs == 1
    assert GOLDILOCKS.n_bytes == 8 and GOLDILOCKS.n_limbs == 4
    assert BLS12_381_FR.n_bytes == 32 and BLS12_381_FR.n_limbs == 16
    assert BLS12_377_FR.n_bytes == 32 and BLS12_377_FR.n_limbs == 16


def test_two_adicity():
    assert F17.two_adicity == 4
    assert GOLDILOCKS.two_adicity == 32
    assert BLS12_381_FR.two_adicity == 32
    assert BLS12_377_FR.two_adicity == 47


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_two_adic_root_has_exact_order(f):
    s = f.two_adicity
    root = f.two_adic_root
    assert pow(root, 1 << s, f.p) == 1
    assert pow(root, 1 << (s - 1), f.p) == f.p - 1  # primitive: order exactly 2^s


def test_f17_two_adic_root_matches_arkworks():
    # generator 3, (17-1)/16 = 1 -> root = 3
    assert F17.two_adic_root == 3


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_host_ops_fuzz(f):
    rng = random.Random(1234)
    for _ in range(200):
        a = rng.randrange(f.p)
        b = rng.randrange(f.p)
        assert f.add(a, b) == (a + b) % f.p
        assert f.sub(a, b) == (a - b) % f.p
        assert f.mul(a, b) == (a * b) % f.p
        if a != 0:
            assert f.mul(a, f.inv(a)) == 1


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_serialization_roundtrip(f):
    rng = random.Random(99)
    for _ in range(50):
        a = rng.randrange(f.p)
        blob = f.to_bytes_be(a)
        assert len(blob) == f.n_bytes
        assert f.from_be_bytes_mod_order(blob) == a


def test_serialization_big_endian_layout():
    # F17: value 5 over 8 bytes big-endian
    assert F17.to_bytes_be(5) == b"\x00" * 7 + b"\x05"
    # reduction semantics: 2^256 - 1 mod p
    raw = b"\xff" * 32
    assert BLS12_381_FR.from_be_bytes_mod_order(raw) == ((1 << 256) - 1) % BLS12_381_FR.p


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_limb_roundtrip_and_montgomery(f):
    rng = random.Random(7)
    for _ in range(50):
        a = rng.randrange(f.p)
        assert f.from_limbs(f.to_limbs(a)) == a
        assert f.from_mont(f.to_mont(a)) == a
    # Montgomery constant sanity: p * p_inv_neg = -1 mod R
    assert (f.p * f.p_inv_neg) % f.R == f.R - 1


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.name)
def test_get_root_of_unity(f):
    for log_n in (1, 2, f.two_adicity):
        n = 1 << log_n
        w = f.get_root_of_unity(n)
        assert pow(w, n, f.p) == 1
        assert pow(w, n // 2, f.p) == f.p - 1
    with pytest.raises(ValueError):
        f.get_root_of_unity(1 << (f.two_adicity + 1))
    with pytest.raises(ValueError):
        f.get_root_of_unity(3)
