"""Break down where the 2^n sumcheck prover spends its time on TPU.

Every component is timed as a CHAIN of dependent dispatches with one
device_get barrier at the end: on the axon tunnel, per-call timing is
swamped by the ~26 ms readback RTT and block_until_ready is not a
reliable barrier, so chained-throughput is the only trustworthy number
(the RTT is measured separately and subtracted).

Components (capacity-kernel tier, zk_tpu/sumcheck/capacity.py):
  * fold_halfsums  — the fused degree-1 round (fold + next half sums)
  * fold           — plain in-place fold
  * round_sums     — first-round sums
  * transcript     — absorb+squeeze+challenge round step (tiny state)
  * mle eval       — the full fold chain (headline workload)
  * prove          — end-to-end prove_partial

Usage: python benches/profile_prover.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
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
from zk_tpu.sumcheck import capacity as C
from zk_tpu.transcript import Transcript, device as tdev

L = FR.n_limbs
N = 1 << n


def barrier(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[:1]))


@jax.jit
def make_table(key):
    bits = jax.random.bits(key, (L, N), dtype=jnp.uint32)
    limbs = bits & jnp.uint32(0xFFFF)
    return limbs.at[L - 1].set(limbs[L - 1] & jnp.uint32(0x1FFF))


table = make_table(jax.random.key(7))
barrier(table)
r = jnp.asarray(dev.const_limbs(FR, 123456789)).reshape(L, 1)

# RTT of a bare readback
t0 = time.time()
barrier(table)
RTT = time.time() - t0
print(f"tunnel readback RTT: {RTT * 1e3:.1f} ms")


def chain(label, step, state, reps=16, work_mults=None):
    state = step(state)  # warm/compile
    barrier(state[0] if isinstance(state, tuple) else state)
    t0 = time.time()
    for _ in range(reps):
        state = step(state)
    barrier(state[0] if isinstance(state, tuple) else state)
    dt = (time.time() - t0 - RTT) / reps
    extra = ""
    if work_mults:
        extra = f" -> {work_mults / dt / 1e6:.0f} M mults/s"
    print(f"{label}: {dt * 1e3:.2f} ms/iter{extra}")
    return dt


stack0 = jnp.reshape(table, (1, L, N))

# fused degree-1 round at full size (dominant round): fold+halfsums
chain(
    "fold_halfsums_cap (size 2^%d)" % n,
    lambda st: C._fold_halfsums_cap(FR, N, N, st[0] if isinstance(st, tuple) else st, r)[0],
    stack0,
    work_mults=N // 2,
)

stack0 = jnp.reshape(table, (1, L, N))
chain(
    "fold_cap (size 2^%d)" % n,
    lambda st: C._fold_cap(FR, 1, N, N, st, r),
    stack0,
    work_mults=N // 2,
)

stack0 = jnp.reshape(table, (1, L, N))
sums_state = (stack0, None)
def sums_step(st):
    stack, _ = st
    return (stack, C._round_sums_cap(FR, 1, 1, N, N, stack))
st = sums_step(sums_state); barrier(st[1])
t0 = time.time()
for _ in range(16):
    st = sums_step(st)
barrier(st[1])
print(f"round_sums_cap deg1 (size 2^{n}): {(time.time()-t0-RTT)/16*1e3:.2f} ms/iter (adds only)")

# transcript round on tiny state
tr = Transcript()
tr.append(b"profile")
lanes, pend = tr.export_state()
lo, hi, buf, pos = tdev.state_to_device(lanes, pend)
acc = jnp.zeros((2, L, C.BLOCK), jnp.uint32)
def tr_step(st):
    lo, hi, buf = st
    lo, hi, buf, _t, _c, _m = C._transcript_round_cap(FR, 1, 32, lo, hi, buf, (acc,))
    return (lo, hi, buf)
st = tr_step((lo, hi, buf)); barrier(st[0])
t0 = time.time()
for _ in range(24):
    st = tr_step(st)
barrier(st[0])
print(f"transcript round (absorb+squeeze+challenge): {(time.time()-t0-RTT)/24*1e3:.2f} ms/round")

# headline workloads
poly = MLE(FR, n, table)
point = [(0x1234567 + i * 0xDEADBEEF) % FR.p for i in range(n)]
poly.evaluate(point)
t0 = time.time()
reds = [poly.partial_evaluate(0, point) for _ in range(8)]
dev.decode_ints(FR, jnp.concatenate([x.data for x in reds], axis=1))
dt = (time.time() - t0) / 8
print(f"mle eval pipelined x8: {dt * 1e3:.1f} ms/eval -> {N / dt / 1e6:.0f} M mults/s")

s = dev.sum_mod(FR, poly.data, -1)
total = dev.decode_ints(FR, s.reshape(L, 1))[0]
pp = ProductPoly([poly])
SumcheckProver.prove_partial(pp, total, max_var_degree=1)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    SumcheckProver.prove_partial(pp, total, max_var_degree=1)
    best = min(best, time.time() - t0)
print(f"prove_partial end-to-end: {best * 1e3:.1f} ms")
