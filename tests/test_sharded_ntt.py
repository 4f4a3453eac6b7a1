"""Distributed 4-step NTT on the CPU mesh vs the single-chip transform."""

import random

import pytest

from zk_tpu.fields import BLS12_381_FR as FR, GOLDILOCKS
from zk_tpu.fields import device as dev
from zk_tpu.ntt import intt_device, ntt_device
from zk_tpu.parallel import make_mesh
from zk_tpu.parallel.ntt import gather_natural, ntt_sharded


@pytest.mark.parametrize("field", [GOLDILOCKS, FR], ids=lambda f: f.name)
def test_sharded_ntt_matches_single_chip(field):
    mesh = make_mesh(8)
    rng = random.Random(5)
    n = 1 << 12  # n1 = n2 = 64, divisible by 8
    vals = [rng.randrange(field.p) for _ in range(n)]
    data = dev.encode_ints(field, vals)
    out3 = ntt_sharded(mesh, field, data)
    got = dev.decode_ints(field, gather_natural(field, out3))
    want = dev.decode_ints(field, ntt_device(field, data))
    assert got == want


def test_sharded_intt_roundtrip():
    field = GOLDILOCKS
    mesh = make_mesh(8)
    rng = random.Random(6)
    n = 1 << 12
    vals = [rng.randrange(field.p) for _ in range(n)]
    data = dev.encode_ints(field, vals)
    fwd = gather_natural(field, ntt_sharded(mesh, field, data))
    back = gather_natural(field, ntt_sharded(mesh, field, fwd, inverse=True))
    assert dev.decode_ints(field, back) == vals


def test_sharded_ntt_small_mesh():
    field = GOLDILOCKS
    mesh = make_mesh(4)
    rng = random.Random(7)
    n = 1 << 10  # n1 = n2 = 32, divisible by 4
    vals = [rng.randrange(field.p) for _ in range(n)]
    data = dev.encode_ints(field, vals)
    got = dev.decode_ints(field, gather_natural(field, ntt_sharded(mesh, field, data)))
    want = dev.decode_ints(field, ntt_device(field, data))
    assert got == want
