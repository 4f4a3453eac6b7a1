"""C keccak backend vs pure-Python tier: identical bytes on all paths."""

import random

import pytest

from zk_tpu.transcript.keccak import Keccak256, keccak256

native = pytest.importorskip("zk_tpu.native")


def test_known_vectors():
    h = native.NativeKeccak256()
    assert (
        h.digest().hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    h2 = native.NativeKeccak256()
    h2.update(b"abc")
    assert (
        h2.digest().hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_streaming_equivalence_fuzz():
    rng = random.Random(0)
    for trial in range(20):
        chunks = [
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
            for _ in range(rng.randrange(1, 6))
        ]
        h_py = Keccak256()
        h_c = native.NativeKeccak256()
        for c in chunks:
            h_py.update(c)
            h_c.update(c)
        assert h_c.digest() == h_py.digest()


def test_finalize_reset_chain():
    h_py = Keccak256()
    h_c = native.NativeKeccak256()
    for step in range(5):
        h_py.update(b"data%d" % step)
        h_c.update(b"data%d" % step)
        d_py = h_py.finalize_reset()
        d_c = h_c.finalize_reset()
        assert d_c == d_py
        h_py.update(d_py)
        h_c.update(d_c)


def test_large_input():
    data = bytes(range(256)) * 4096  # 1 MiB
    h = native.NativeKeccak256()
    h.update(data)
    assert h.digest() == keccak256(data)


def test_transcript_uses_native_when_available():
    import zk_tpu.transcript as t

    assert t.HAS_NATIVE
