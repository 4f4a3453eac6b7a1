"""MLE full-evaluation benchmark — the reference's own headline harness.

Mirrors polynomial/benches/polynomial_evaluation.rs: evaluate a random
18..21-variable BLS12-381 Fr MLE at a random point, report wall time and
the deterministic field-op count (~2^n mults — 1 per index pair,
evaluation_form.rs:68).  The whole n-round fold is ONE jitted graph here,
so this measures pure device throughput with a single dispatch.

Usage: python benches/mle_evaluation.py [min_vars max_vars]
"""

import sys
import time

import jax
import jax.numpy as jnp

from zk_tpu.fields import BLS12_381_FR as FR
from zk_tpu.poly import MLE
from zk_tpu.poly.mle import _fold_kernel as _mle_fold_kernel  # noqa: F401
from zk_tpu.utils import mle_eval_mults


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    for n in range(lo, hi + 1):
        key = jax.random.key(n)

        @jax.jit
        def make(key, n=n):
            bits = jax.random.bits(key, (FR.n_limbs, 1 << n), dtype=jnp.uint32)
            limbs = bits & jnp.uint32(0xFFFF)
            return limbs.at[FR.n_limbs - 1].set(
                limbs[FR.n_limbs - 1] & jnp.uint32(0x1FFF)
            )

        poly = MLE(FR, n, make(key))
        point = [(1234567 + i) % FR.p for i in range(n)]
        # warm (compiles the fold graph)
        poly.evaluate(point)
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            poly.evaluate(point)
            best = min(best, time.time() - t0)
        mults = mle_eval_mults(n)
        print(
            f"n={n}: {best * 1e3:8.2f} ms  {mults / best / 1e6:9.1f} M field-mults/s"
        )


if __name__ == "__main__":
    main()
