"""Break down where the 2^24 sumcheck prover chain spends its time on TPU.

Times three device programs separately (warm):
  1. the MLE fold chain alone (the headline eval workload),
  2. the full _prove_chain (device-resident Fiat-Shamir),
  3. a challenge-only transcript chain (24 rounds of absorb+squeeze on
     tiny state, no table work) to isolate per-round transcript cost.

Usage: python benches/profile_prover.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zk_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 24

from zk_tpu.fields import BLS12_381_FR as FR
from zk_tpu.fields import device as dev
from zk_tpu.poly import MLE, ProductPoly
from zk_tpu.sumcheck import SumcheckProver
from zk_tpu.sumcheck import kernels as K
from zk_tpu.transcript import Transcript, device as tdev


def timeit(label, fn, reps=3):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.1f} ms")
    return best


@jax.jit
def make_table(key):
    bits = jax.random.bits(key, (FR.n_limbs, 1 << n), dtype=jnp.uint32)
    limbs = bits & jnp.uint32(0xFFFF)
    return limbs.at[FR.n_limbs - 1].set(limbs[FR.n_limbs - 1] & jnp.uint32(0x1FFF))


table = jax.block_until_ready(make_table(jax.random.key(7)))
poly = MLE(FR, n, table)
point = [(0x1234567 + i * 0xDEADBEEF) % FR.p for i in range(n)]

timeit("mle eval (fold chain, single dispatch)", lambda: poly.evaluate(point))

s = dev.sum_mod(FR, poly.data, -1)
total = dev.decode_ints(FR, s.reshape(FR.n_limbs, 1))[0]
pp = ProductPoly([poly])
timeit(
    "sumcheck prove_partial (device transcript)",
    lambda: SumcheckProver.prove_partial(pp, total, max_var_degree=1),
)

# transcript-only chain: same number of rounds, tiny fixed sums input
tr = Transcript()
tr.append(FR.to_bytes_be(total))
lanes, pend = tr.export_state()


def transcript_only(rounds):
    lo, hi, buf = tdev.state_to_device(lanes, pend)[:3]
    pos = len(pend)
    norm = jnp.ones((2, FR.n_limbs + 1), jnp.uint32)
    outs = []
    for _ in range(rounds):
        lo, hi, buf, tot, ch, _m = K._transcript_round(
            FR, 1, pos, lo, hi, buf, (norm,)
        )
        pos = 32
        outs.append(ch)
    return jax.block_until_ready(outs)


rounds = n - 7  # matches the chain's device-round count
timeit(f"transcript-only chain ({rounds} rounds)", lambda: transcript_only(rounds))

# fold+halfsums rounds only (no transcript): fixed challenge per round
r = jnp.asarray(dev.const_limbs(FR, 12345)).reshape(FR.n_limbs, 1)


def folds_only():
    stack = table[None]
    size = 1 << n
    accs = []
    while size >= 512:
        stack, acc = K._fold_halfsums_pallas(FR, size, stack, r)
        accs.append(acc)
        size //= 2
    return jax.block_until_ready(accs)


timeit("fold+halfsums rounds only (no transcript)", folds_only)
