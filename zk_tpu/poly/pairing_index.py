"""Hypercube pairing-index utilities (host tier).

Mirrors polynomial/src/multilinear/pairing_index.rs.  The device tier
never materializes these indices — the fold's pairing is a reshape
(zk_tpu/poly/mle.py) — but they remain part of the public surface for
host-side reasoning/tests and encode the variable-order convention
(variable 0 = most significant bit of the element index).
"""

from __future__ import annotations

from typing import Iterator


def mask(n: int) -> int:
    """n low bits set (pairing_index.rs:24-26)."""
    return (1 << n) - 1


def insert_bit(val: int, index: int, bit: int) -> int:
    """Insert a bit at position `index` counted from the LSB
    (pairing_index.rs:16-20)."""
    high = val >> index
    low = val & mask(index)
    return (high << (index + 1)) | (bit << index) | low


def index_pair(n_vars: int, index: int) -> Iterator[tuple[int, int]]:
    """All 2^(n-1) index pairs differing only in variable `index`
    (pairing_index.rs:2-9): pairs (i0, i0 | 2^(n-1-index)) in ascending
    order of the reduced index."""
    base = n_vars - 1
    for val in range(1 << base):
        low = insert_bit(val, base - index, 0)
        yield (low, low | (1 << (base - index)))
