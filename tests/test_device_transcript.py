"""Device-resident Fiat-Shamir transcript (zk_tpu/transcript/device.py).

Byte-exactness is the whole game (SURVEY.md §7 risk 2): every test here
is a differential against the host transcript / host-tier prover, plus
the Keccak-256 known-answer vector.  Runs on the CPU mesh (conftest).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zk_tpu.fields import BLS12_381_FR as FR, GOLDILOCKS
from zk_tpu.fields import device as dev
from zk_tpu.poly import MLE, ProductPoly
from zk_tpu.sumcheck import SumcheckProver, SumcheckVerifier
from zk_tpu.transcript import Transcript
from zk_tpu.transcript import device as dt
from zk_tpu.transcript.keccak import keccak256


def _zeros_state():
    return (
        jnp.zeros(25, jnp.uint32),
        jnp.zeros(25, jnp.uint32),
        jnp.zeros(136, jnp.uint32),
        0,
    )


def _dev_bytes(arr) -> bytes:
    return bytes(int(x) & 0xFF for x in jax.device_get(arr))


def _to_u32(data: bytes):
    return jnp.asarray(np.frombuffer(data, np.uint8).astype(np.uint32))


def test_empty_digest_known_answer():
    lo, hi, buf, pos = _zeros_state()
    digest = dt.squeeze(lo, hi, buf, pos)
    # the well-known Keccak-256("") constant (e.g. Ethereum's empty hash)
    assert _dev_bytes(digest) == bytes.fromhex(
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"") == _dev_bytes(digest)


def test_absorb_squeeze_differential_vs_host():
    rng = random.Random(11)
    host = Transcript()
    lo, hi, buf, pos = _zeros_state()
    for step in range(5):
        n = rng.choice([1, 31, 32, 135, 136, 137, 272, 300])
        data = bytes(rng.randrange(256) for _ in range(n))
        host.append(data)
        lo, hi, buf, pos = dt.absorb(lo, hi, buf, pos, _to_u32(data))
        assert host._hasher.digest() == _dev_bytes(dt.squeeze(lo, hi, buf, pos))
        ch_host = host.sample_challenge()
        lo, hi, buf, pos, digest = dt.sample_challenge(lo, hi, buf, pos)
        assert ch_host == _dev_bytes(digest)
        assert pos == 32


@pytest.mark.parametrize("field", [FR, GOLDILOCKS], ids=lambda f: f.name)
def test_challenge_reduction_matches_from_be_bytes(field):
    rng = random.Random(5)
    for _ in range(3):
        raw = bytes(rng.randrange(256) for _ in range(32))
        digest = _to_u32(raw)
        mont, canon = dt.challenge_from_digest(field, digest)
        want = field.from_be_bytes_mod_order(raw)
        assert dev.decode_ints(field, canon, mont=False)[0] == want
        assert dev.decode_ints(field, mont, mont=True)[0] == want


@pytest.mark.parametrize("field", [FR, GOLDILOCKS], ids=lambda f: f.name)
def test_serialize_canonical_matches_elements_to_bytes(field):
    rng = random.Random(7)
    vals = [rng.randrange(field.p) for _ in range(4)]
    enc = dev.encode_ints(field, vals, mont=False)
    assert _dev_bytes(dt.serialize_canonical(field, enc)) == field.elements_to_bytes(
        vals
    )


def test_state_migration_roundtrip():
    host = Transcript()
    host.append(b"prefix bytes" * 9)
    lanes, pend = host.export_state()
    lo, hi, buf, pos = dt.state_to_device(lanes, pend)
    lo, hi, buf, pos = dt.absorb(lo, hi, buf, pos, _to_u32(b"device segment"))
    lanes2, pend2 = dt.state_to_host(lo, hi, buf, pos)
    host2 = Transcript()
    host2.import_state(lanes2, pend2)
    host.append(b"device segment")
    assert host.sample_challenge() == host2.sample_challenge()


@pytest.mark.parametrize("field", [FR, GOLDILOCKS], ids=lambda f: f.name)
def test_device_transcript_prover_bit_exact(field):
    """Proof bytes from the fully-async device-transcript tier must equal
    the host tier's, with and without the host-tail migration."""
    rng = random.Random(13)
    n_vars, k = 5, 2
    evals = [[rng.randrange(field.p) for _ in range(1 << n_vars)] for _ in range(k)]
    pp = ProductPoly([MLE.new(field, n_vars, e) for e in evals])
    total = 0
    for idx in range(1 << n_vars):
        prod = 1
        for e in evals:
            prod = prod * e[idx] % field.p
        total = (total + prod) % field.p

    ph, ch = SumcheckProver.prove_partial(pp, total, device_transcript=False)
    pd, cd = SumcheckProver.prove_partial(pp, total, device_transcript=True, tail_size=0)
    assert ph.round_polys == pd.round_polys
    assert ch == cd
    # host-tail migration mid-proof
    pt, ct = SumcheckProver.prove_partial(
        pp, total, device_transcript=True, tail_size=1 << (n_vars - 2)
    )
    assert pt.round_polys == ph.round_polys and ct == ch
    sub = SumcheckVerifier.verify_partial(field, pd)
    assert pp.evaluate(sub.challenges) == sub.sum


def test_device_transcript_full_prove_degree1():
    """prove() (poly bytes bound) on a single-MLE degree-1 sumcheck —
    exercises the prefix export path with a large host-absorbed prefix."""
    rng = random.Random(17)
    field = GOLDILOCKS
    n_vars = 6
    evals = [rng.randrange(field.p) for _ in range(1 << n_vars)]
    pp = ProductPoly([MLE.new(field, n_vars, evals)])
    total = sum(evals) % field.p
    fh = SumcheckProver.prove(pp, total, device_transcript=False)
    fd = SumcheckProver.prove(pp, total, device_transcript=True, tail_size=0)
    assert fh.round_polys == fd.round_polys
    assert SumcheckVerifier.verify(pp, fd)
