"""NTT/iNTT tests: reference roundtrip (fft/src/lib.rs:63-83) + DFT oracle."""

import random

import pytest

from zk_tpu.fields import BLS12_377_FR, BLS12_381_FR, F17, GOLDILOCKS
from zk_tpu.ntt import host_dft, intt, ntt


def test_reference_roundtrip_bls377():
    # fft/src/lib.rs:79-82 exactly: a = [0, 2, 34, 3434]
    a = [0, 2, 34, 3434]
    assert intt(BLS12_377_FR, ntt(BLS12_377_FR, a)) == a


@pytest.mark.parametrize("f", [F17, GOLDILOCKS, BLS12_381_FR, BLS12_377_FR], ids=lambda f: f.name)
def test_matches_host_dft(f):
    rng = random.Random(42)
    n = min(16, 1 << f.two_adicity)
    vals = [rng.randrange(f.p) for _ in range(n)]
    assert ntt(f, vals) == host_dft(f, vals)
    assert intt(f, vals) == host_dft(f, vals, inverse=True)


@pytest.mark.parametrize("f", [GOLDILOCKS, BLS12_381_FR], ids=lambda f: f.name)
def test_roundtrip_larger(f):
    rng = random.Random(7)
    n = 256
    vals = [rng.randrange(f.p) for _ in range(n)]
    assert intt(f, ntt(f, vals)) == vals


def test_convolution_property():
    # NTT(a) .* NTT(b) = NTT(a conv b): the defining use-case
    f = GOLDILOCKS
    rng = random.Random(3)
    n = 16
    a = [rng.randrange(f.p) for _ in range(n // 2)] + [0] * (n // 2)
    b = [rng.randrange(f.p) for _ in range(n // 2)] + [0] * (n // 2)
    fa, fb = ntt(f, a), ntt(f, b)
    prod = [f.mul(x, y) for x, y in zip(fa, fb)]
    got = intt(f, prod)
    want = [0] * n
    for i in range(n // 2):
        for j in range(n // 2):
            want[(i + j) % n] = f.add(want[(i + j) % n], f.mul(a[i], b[j]))
    assert got == want


def test_non_power_of_two_panics():
    with pytest.raises(ValueError):
        ntt(F17, [1, 2, 3])


def test_size_one_identity():
    assert ntt(F17, [5]) == [5]
    assert intt(F17, [5]) == [5]


def test_four_step_matches_dft():
    # n = 2^13 goes through the Bailey 4-step path (_DIRECT_LADDER_MAX = 2^12)
    import numpy as np

    from zk_tpu.fields import device as dev
    from zk_tpu.ntt import intt_device, ntt_device

    f = GOLDILOCKS
    rng = random.Random(11)
    n = 1 << 13
    vals = [rng.randrange(f.p) for _ in range(n)]
    data = dev.encode_ints(f, vals)
    out = ntt_device(f, data)
    got = dev.decode_ints(f, out)
    # spot-check outputs against the DFT definition
    omega = f.get_root_of_unity(n)
    for k in (0, 1, 5, n - 1):
        want = 0
        wk = pow(omega, k, f.p)
        cur = 1
        for v in vals:
            want = (want + v * cur) % f.p
            cur = (cur * wk) % f.p
        assert got[k] == want, k
    # roundtrip through the 4-step inverse
    back = dev.decode_ints(f, intt_device(f, out))
    assert back == vals


def test_ntt_with_root_parity():
    # fft_internal semantics: same DFT given the standard root, and the
    # ifft identity fft_internal(., w^-1) scaled by n^-1
    from zk_tpu.ntt import ntt_with_root

    f = F17
    vals = [1, 5, 3, 2]
    w = f.get_root_of_unity(4)
    assert ntt_with_root(f, vals, w) == ntt(f, vals)
    evals = ntt(f, vals)
    n_inv = f.inv(4)
    back = [f.mul(v, n_inv) for v in ntt_with_root(f, evals, f.inv(w))]
    assert back == vals
    with pytest.raises(ValueError):
        ntt_with_root(f, vals, 2)  # 2 is not a primitive 4th root mod 17
