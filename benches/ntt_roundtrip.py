"""NTT/iNTT roundtrip benchmark at 2^20 points (BASELINE.json config 2).

The reference fft crate ships a correctness test only (fft/src/lib.rs:
79-82); this measures the device ladder/4-step at the driver-set size.
Cost model: (n/2) log2(n) Montgomery mults per transform.

Usage: python benches/ntt_roundtrip.py [log_n] [field]
"""

import sys
import time

import jax
import jax.numpy as jnp

from zk_tpu.fields import BLS12_377_FR, BLS12_381_FR, GOLDILOCKS
from zk_tpu.ntt import intt_device, ntt_device

FIELDS = {
    "goldilocks": GOLDILOCKS,
    "bls12_381": BLS12_381_FR,
    "bls12_377": BLS12_377_FR,
}


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    field = FIELDS[sys.argv[2]] if len(sys.argv) > 2 else GOLDILOCKS
    n = 1 << log_n

    @jax.jit
    def make(key):
        bits = jax.random.bits(key, (field.n_limbs, n), dtype=jnp.uint32)
        limbs = bits & jnp.uint32(0xFFFF)
        top_mask = (1 << (field.bits - 16 * (field.n_limbs - 1) - 2)) - 1
        return limbs.at[field.n_limbs - 1].set(
            limbs[field.n_limbs - 1] & jnp.uint32(top_mask)
        )

    data = make(jax.random.key(0))

    # block_until_ready does not actually block through the axon tunnel;
    # a tiny D2H read is the only reliable completion barrier
    def sync(a):
        return jax.device_get(a[:, :1])

    # warm (also compiles the sync slice)
    out = intt_device(field, ntt_device(field, data))
    sync(out)
    assert bool(jnp.array_equal(out, data)), "roundtrip mismatch"

    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = intt_device(field, ntt_device(field, data))
        sync(out)
        best = min(best, time.time() - t0)
    mults = 2 * (n // 2) * log_n  # fwd + inv transforms
    print(
        f"{field.name} 2^{log_n} roundtrip: {best * 1e3:.2f} ms "
        f"({mults / best / 1e6:.1f} M butterfly-mults/s)"
    )


if __name__ == "__main__":
    main()
