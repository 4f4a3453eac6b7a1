"""TPU-gated differential tests for the Pallas tier (auto-skip on CPU).

Run against the real chip with ``ZK_TPU_TEST_TPU=1 python -m pytest
tests/test_pallas_kernels.py`` (tests/conftest.py then skips the CPU
pinning).  Every kernel is checked for exact equality against the jnp
device tier (zk_tpu.fields.device), which the CPU suite in turn checks
against exact host ints — so the chain pins the Pallas tier to bigint
ground truth.

Covers the elementwise kernels (zk_tpu/fields/pallas_kernels.py), the
capacity-buffer round kernels (zk_tpu/sumcheck/capacity.py) including
the in-place aliasing and the dynamic-size reuse of one compiled kernel
across sizes, and the device Keccak permutation.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zk_tpu.fields import BLS12_381_FR as FR, GOLDILOCKS
from zk_tpu.fields import device as dev
from zk_tpu.fields.pallas_kernels import lerp_pallas, mont_mul_pallas, on_tpu

pytestmark = pytest.mark.skipif(not on_tpu(), reason="needs a real TPU")

FIELDS = [GOLDILOCKS, FR]


def _rand_table(field, n, seed):
    rng = random.Random(seed)
    return [rng.randrange(field.p) for _ in range(n)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_mul_pallas_matches_jnp(field):
    n = 2048
    a = dev.encode_ints(field, _rand_table(field, n, 1))
    b = dev.encode_ints(field, _rand_table(field, n, 2))
    got = mont_mul_pallas(field, a, b)
    want = dev.mont_mul(field, a, b)
    assert bool(jnp.array_equal(got, want))


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_lerp_pallas_matches_jnp(field):
    n = 2048
    a = dev.encode_ints(field, _rand_table(field, n, 3))
    b = dev.encode_ints(field, _rand_table(field, n, 4))
    r = dev.scalar(field, 123456789)
    got = lerp_pallas(field, a, b, r)
    want = dev.lerp(field, a, b, r)
    assert bool(jnp.array_equal(got, want))


def _stack(field, k, n, seed):
    return jnp.stack(
        [dev.encode_ints(field, _rand_table(field, n, seed + t)) for t in range(k)]
    )


@pytest.mark.parametrize("degree,k", [(1, 1), (2, 2), (2, 1), (3, 3)])
def test_round_sums_cap_matches_jnp(degree, k):
    from zk_tpu.sumcheck import capacity as C
    from zk_tpu.sumcheck.kernels import _sums_jnp_stack, decode_relaxed_sums

    field = FR
    cap = 8192
    stack = _stack(field, k, cap, 10)
    for size in (cap, cap // 2):
        acc = C._round_sums_cap(field, degree, k, cap, size, stack)
        got = decode_relaxed_sums(field, acc)
        want = dev.decode_ints(
            field, _sums_jnp_stack(field, degree, stack[:, :, :size]).T
        )
        # _sums_jnp_stack returns (D+1, L); transpose decoded per point
        assert got == want, f"size={size}"


@pytest.mark.parametrize("k", [1, 2])
def test_fold_cap_in_place_across_rounds(k):
    """One compiled kernel serves successive sizes; folded prefix matches
    the jnp tier at every step (in-place aliasing correctness)."""
    from zk_tpu.sumcheck import capacity as C

    field = FR
    cap = 16384
    stack = _stack(field, k, cap, 20)
    oracle = jnp.array(stack, copy=True)  # folds donate `stack` in place
    r = dev.scalar(field, 0xABCDEF123)
    size = cap
    for _ in range(2):
        stack = C._fold_cap(field, k, cap, size, stack, r)
        half = size // 2
        oracle = jnp.stack(
            [
                dev.lerp(field, oracle[t][:, : half], oracle[t][:, half : size], r)
                for t in range(k)
            ]
        )
        size = half
        assert bool(jnp.array_equal(stack[:, :, :size], oracle))


def test_fold_halfsums_cap_matches_separate():
    from zk_tpu.sumcheck import capacity as C
    from zk_tpu.sumcheck.kernels import decode_relaxed_sums

    field = FR
    cap = 8192
    stack = _stack(field, 1, cap, 30)
    r = dev.scalar(field, 987654321)
    want_fold = dev.lerp(field, stack[0][:, : cap // 2], stack[0][:, cap // 2 :], r)
    folded, acc = C._fold_halfsums_cap(field, cap, cap, stack, r)
    assert bool(jnp.array_equal(folded[0, :, : cap // 2], want_fold))
    got = decode_relaxed_sums(field, acc)
    evals = dev.decode_ints(field, want_fold)
    q = cap // 4
    assert got == [sum(evals[:q]) % field.p, sum(evals[q:]) % field.p]


@pytest.mark.parametrize("f", [1, 2, 3, 4])
def test_fold_multi_cap_matches_sequential(f):
    from zk_tpu.sumcheck import capacity as C

    field = FR
    cap = 1 << 14
    stack = _stack(field, 1, cap, 40)
    rs_ints = [1000 + i for i in range(f)]
    rs = jnp.stack([jnp.asarray(dev.const_limbs(field, v)) for v in rs_ints]).T
    oracle = jnp.array(stack[0], copy=True)  # the fold donates `stack`
    out = C._fold_multi_cap(field, f, cap, cap, stack, rs)
    for v in rs_ints:
        half = oracle.shape[-1] // 2
        oracle = dev.lerp(field, oracle[:, :half], oracle[:, half:], dev.scalar(field, v))
    assert bool(jnp.array_equal(out[0, :, : cap >> f], oracle))


def test_keccak_f1600_pallas_matches_python():
    from zk_tpu.transcript import device as tdev
    from zk_tpu.transcript.keccak import keccak_f1600

    rng = random.Random(50)
    lanes = [rng.randrange(1 << 64) for _ in range(25)]
    lo = jnp.asarray(np.array([l & 0xFFFFFFFF for l in lanes], dtype=np.uint32))
    hi = jnp.asarray(np.array([l >> 32 for l in lanes], dtype=np.uint32))
    olo, ohi = tdev._keccak_f1600_pallas(lo, hi)
    want = keccak_f1600(list(lanes))
    got = [int(a) | (int(b) << 32) for a, b in zip(np.asarray(olo), np.asarray(ohi))]
    assert got == want


def test_prover_tiers_byte_identical():
    """Device-transcript capacity path vs exact host-int tier."""
    from zk_tpu.poly import MLE, ProductPoly
    from zk_tpu.sumcheck import SumcheckProver

    n = 13
    vals = _rand_table(FR, 1 << n, 60)
    poly = MLE.new(FR, n, vals)
    pp = ProductPoly([poly])
    total = sum(vals) % FR.p
    dev_proof, dev_ch = SumcheckProver.prove_partial(
        pp, total, max_var_degree=1, device_transcript=True
    )
    host_proof, host_ch = SumcheckProver.prove_partial(
        pp, total, max_var_degree=1, tail_size=1 << 30, device_transcript=False
    )
    assert dev_proof == host_proof and dev_ch == host_ch


def test_prover_tiers_sum_of_products_byte_identical():
    """The combined-terms capacity path (one sums kernel per round for a
    SumOfProducts) must match the exact host-int tier byte for byte."""
    from zk_tpu.poly import MLE, ProductPoly, SumOfProducts
    from zk_tpu.sumcheck import SumcheckProver

    n = 13
    a = MLE.new(FR, n, _rand_table(FR, 1 << n, 70))
    b = MLE.new(FR, n, _rand_table(FR, 1 << n, 71))
    c = MLE.new(FR, n, _rand_table(FR, 1 << n, 72))
    sp = SumOfProducts([ProductPoly([a, b]), ProductPoly([c])])
    av, bv, cv = a.evaluation_ints(), b.evaluation_ints(), c.evaluation_ints()
    total = sum(FR.add(FR.mul(x, y), z) for x, y, z in zip(av, bv, cv)) % FR.p
    dev_proof, dev_ch = SumcheckProver.prove_partial(
        sp, total, max_var_degree=2, device_transcript=True
    )
    host_proof, host_ch = SumcheckProver.prove_partial(
        sp, total, max_var_degree=2, tail_size=1 << 30, device_transcript=False
    )
    assert dev_proof == host_proof and dev_ch == host_ch
