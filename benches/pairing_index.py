"""Pairing-index generation bench — mirrors the reference's criterion
bench (polynomial/benches/pairing_index.rs:9-22): materialize all index
pairs for variable 12 of an 18..21-variable hypercube.

On TPU the device fold is index-free (reshape pairing, zk_tpu/poly/
mle.py), so this measures the HOST utility only — recorded for parity
with the reference's measurement surface.  Both the Python-loop
generator (reference-shaped) and the vectorized numpy variant are timed.

Usage: python benches/pairing_index.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from zk_tpu.poly.pairing_index import index_pair


def index_pairs_np(n_vars: int, index: int) -> np.ndarray:
    """Vectorized equivalent: (2^(n-1), 2) array of pairs."""
    half_bit = 1 << (n_vars - 1 - index)
    base = np.arange(1 << (n_vars - 1), dtype=np.int64)
    low = base & (half_bit - 1)
    high = (base >> (n_vars - 1 - index)) << (n_vars - index)
    first = high | low if index == 0 else ((base // half_bit) * (2 * half_bit)) + low
    return np.stack([first, first + half_bit], axis=1)


def main():
    for n in range(18, 22):
        t0 = time.time()
        pairs = list(index_pair(n, 12))
        dt = time.time() - t0
        t0 = time.time()
        arr = index_pairs_np(n, 12)
        dt_np = time.time() - t0
        assert arr.shape[0] == len(pairs)
        assert tuple(arr[0]) == pairs[0] and tuple(arr[-1]) == pairs[-1]
        print(
            f"index_pair(n={n}, index=12): {len(pairs)} pairs, "
            f"python {dt * 1e3:.1f} ms, numpy {dt_np * 1e3:.2f} ms"
        )


if __name__ == "__main__":
    main()
