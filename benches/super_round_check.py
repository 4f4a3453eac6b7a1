"""TPU differential check for the super-round prover chain.

For several sizes, proves the same degree-1 sumcheck through three tiers
and asserts byte-identical proofs + challenge sequences:
  a) default: device transcript + super-round block-sum chain,
  b) device_transcript=False: per-round Pallas kernels + host transcript,
  c) (small n) pure host-int tail tier.
Then times the 2^24 prover end-to-end.

Usage: python -m benches.super_round_check
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zk_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from zk_tpu.fields import BLS12_381_FR as FR
from zk_tpu.fields import device as dev
from zk_tpu.poly import MLE, ProductPoly
from zk_tpu.sumcheck import SumcheckProver, proof_to_bytes


def make_poly(n):
    @jax.jit
    def make_table(key):
        bits = jax.random.bits(key, (FR.n_limbs, 1 << n), dtype=jnp.uint32)
        limbs = bits & jnp.uint32(0xFFFF)
        return limbs.at[FR.n_limbs - 1].set(
            limbs[FR.n_limbs - 1] & jnp.uint32(0x1FFF)
        )

    poly = MLE(FR, n, make_table(jax.random.key(n)))
    s = dev.sum_mod(FR, poly.data, -1)
    total = dev.decode_ints(FR, s.reshape(FR.n_limbs, 1))[0]
    return poly, total


for n in (10, 16, 17):
    poly, total = make_poly(n)
    pp = ProductPoly([poly])
    pa, ca = SumcheckProver.prove_partial(pp, total, max_var_degree=1)
    pb, cb = SumcheckProver.prove_partial(
        pp, total, max_var_degree=1, device_transcript=False
    )
    assert ca == cb, f"n={n}: challenges diverge (super vs per-round)"
    assert proof_to_bytes(FR, pa) == proof_to_bytes(FR, pb), f"n={n}: proofs diverge"
    if n <= 12:
        pc, cc = SumcheckProver.prove_partial(
            pp, total, max_var_degree=1, device_transcript=False, tail_size=1 << n
        )
        assert ca == cc and proof_to_bytes(FR, pa) == proof_to_bytes(FR, pc), (
            f"n={n}: host tier diverges"
        )
    print(f"n={n}: OK ({len(ca)} rounds, tiers byte-identical)")

n = 24
poly, total = make_poly(n)
pp = ProductPoly([poly])
t0 = time.time()
SumcheckProver.prove_partial(pp, total, max_var_degree=1)
print(f"2^24 cold: {time.time() - t0:.2f}s")
best = float("inf")
for _ in range(3):
    t0 = time.time()
    SumcheckProver.prove_partial(pp, total, max_var_degree=1)
    best = min(best, time.time() - t0)
print(f"2^24 warm best: {best:.3f}s ({(1 << n) / best / 1e6:.0f} M mults/s)")
