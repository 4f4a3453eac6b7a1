"""Micro-profile the device-transcript round pieces on TPU.

Times (warm, chained on device, one block_until_ready at the end):
  1. N chained Keccak-f[1600] permutations (the Pallas scalar kernels),
  2. N chained _canon_sums + serialize graphs (no keccak),
  3. N full _transcript_round steps (the real per-round cost),
  4. the elementwise mont_mul and lerp kernel rates at 2^22.

Usage: python -m benches.profile_transcript [N]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zk_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 34

from zk_tpu.fields import BLS12_381_FR as FR
from zk_tpu.fields import device as dev
from zk_tpu.sumcheck import kernels as K
from zk_tpu.transcript import device as tdev


def timeit(label, fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.2f} ms")
    return best


@jax.jit
def keccak_chain(lo, hi):
    for _ in range(N):
        lo, hi = tdev._keccak_f1600_pallas(lo, hi)
    return lo, hi


@jax.jit
def canon_chain(norm):
    outs = []
    for _ in range(N):
        c = K._canon_sums(FR, norm)
        outs.append(tdev.serialize_canonical(FR, c))
        norm = norm + jnp.uint32(1)
    return outs


lo = jnp.arange(25, dtype=jnp.uint32)
hi = jnp.arange(25, dtype=jnp.uint32) * 3
norm = jnp.ones((2, FR.n_limbs + 1), jnp.uint32)

timeit(f"{N} chained keccak-f perms", lambda: jax.device_get(keccak_chain(lo, hi)))
timeit(f"{N} chained canon+serialize", lambda: jax.device_get(canon_chain(norm)))

from zk_tpu.fields.pallas_kernels import mont_mul_pallas

M = 1 << 22
a = jnp.ones((FR.n_limbs, M), jnp.uint32)
b = jnp.ones((FR.n_limbs, M), jnp.uint32) * 2
r = jnp.ones((FR.n_limbs, 1), jnp.uint32)

t = timeit("mont_mul 2^22", lambda: jax.device_get(mont_mul_pallas(FR, a, b)[:, :1]))
print(f"  -> {M/t/1e9:.2f} G mults/s")
from zk_tpu.sumcheck import capacity as C

stack = jnp.stack([jnp.concatenate([a, b], axis=-1)])
t = timeit(
    "fold (lerp) 2^22 pairs (capacity kernel, in-place)",
    lambda: jax.device_get(
        C._fold_cap(FR, 1, 2 * M, 2 * M, stack + jnp.uint32(0), r)[:, :, :1]
    ),
)
print(f"  -> {M/t/1e9:.2f} G lerps/s")
