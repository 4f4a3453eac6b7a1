"""Keccak-256 + Fiat-Shamir transcript golden tests.

Keccak (not SHA3) test vectors are the public known-answer values for the
original Keccak-256 padding; the transcript semantics mirror
transcript/src/lib.rs:5-34 (finalize_reset + re-absorb chaining).
"""

import pytest

from zk_tpu.fields import BLS12_381_FR, F17
from zk_tpu.transcript import Transcript
from zk_tpu.transcript.keccak import Keccak256, keccak256


def test_keccak256_empty():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_keccak256_abc():
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_keccak256_multiblock():
    # > one rate block (136 bytes), incremental == one-shot
    data = bytes(range(256)) * 3
    h = Keccak256()
    for i in range(0, len(data), 17):
        h.update(data[i : i + 17])
    assert h.digest() == keccak256(data)


def test_keccak_digest_does_not_mutate():
    h = Keccak256()
    h.update(b"abc")
    d1 = h.digest()
    d2 = h.digest()
    assert d1 == d2


def test_finalize_reset_chaining():
    # sample_challenge = finalize_reset then re-absorb digest
    t = Transcript()
    t.append(b"hello")
    c1 = t.sample_challenge()
    assert c1 == keccak256(b"hello")
    # second challenge hashes only the previous digest (state was reset)
    c2 = t.sample_challenge()
    assert c2 == keccak256(c1)
    # appending after a challenge extends the re-absorbed digest
    t2 = Transcript()
    t2.append(b"hello")
    t2.sample_challenge()
    t2.sample_challenge()
    t2.append(b"world")
    assert t2.sample_challenge() == keccak256(c2 + b"world")


def test_sample_field_element_reduction():
    t = Transcript()
    t.append(b"seed")
    digest = keccak256(b"seed")
    t2 = Transcript()
    t2.append(b"seed")
    assert t2.sample_field_element(BLS12_381_FR) == int.from_bytes(digest, "big") % BLS12_381_FR.p

    t3 = Transcript()
    t3.append(b"seed")
    assert t3.sample_field_element(F17) == int.from_bytes(digest, "big") % 17


def test_sample_n_field_elements():
    t = Transcript()
    t.append(b"x")
    got = t.sample_n_field_elements(F17, 3)
    t2 = Transcript()
    t2.append(b"x")
    want = [t2.sample_field_element(F17) for _ in range(3)]
    assert got == want
    assert len(set(got)) > 1  # chaining produces distinct challenges
