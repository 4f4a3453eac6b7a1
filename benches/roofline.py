"""Roofline for the hot field kernels: measured machine ceilings vs
analytic per-op costs (round-4 verdict ask #4 — the "speed-of-light"
north-star evidence, BASELINE.json:2).

Two machine ceilings are MEASURED in-image (the axon tunnel forbids
trusting spec sheets for this chip, and XLA's uint32 multiply rate is
not a published number):

  * VPU lane-op rate: one fused elementwise program applying K uint32
    multiply+add+logical steps per element to an HBM-resident array,
    sized so compute >> memory time; rate = K * N / t.
  * HBM bandwidth: a single-pass elementwise copy+add over a large
    array (read N*4 + write N*4 bytes per pass).

Analytic costs per element-op come from zk_tpu/fields/limb_math.py
(every lax bind in the kernel body is one 32-bit VPU lane-op per
element; counts audited against the code below):

  conv_acc(a, b, 2L+1)  : L^2 mul + 2L^2 logical + ~2L^2 add ~= 5L^2
  mont_mul              : 2 full conv_acc + 1 half (constant) conv_acc
                          + 4 carry_props + cond_sub  ~= 12.5L^2 + 22L
  sub_mod               : ~12L
  lerp = mont_mul + 2*sub_mod                         ~= 12.5L^2 + 46L
     L = 16 (BLS12-381 Fr): ~3936 lane-ops, 640 of them multiplies
     L = 4  (Goldilocks)  : ~384 lane-ops,  40 of them multiplies

  HBM bytes per lerp (in-place capacity fold: read left + right, write
  result; r broadcast from VMEM): 3 * 4L B = 192 B (L=16), 48 B (L=4).

The script prints each ceiling, the implied speed-of-light lerp rates,
the measured in-place fold-kernel rate, and the binding fraction.

Run (TPU): python benches/roofline.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zk_tpu.fields import BLS12_381_FR as FR, GOLDILOCKS


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sample(fn, batches=5):
    fn()
    samples = []
    attempts = 0
    while len(samples) < batches and attempts < batches + 3:
        attempts += 1
        t0 = time.time()
        fn()
        dt = time.time() - t0
        if samples and dt > 3 * min(samples):
            continue
        samples.append(dt)
    samples.sort()
    return samples[len(samples) // 2]


def _chain_rate(step, n_log, k_steps, ops_per_step, reps=4, streams=4):
    """Achieved uint32 lane-op rate for a fused chain of k_steps
    elementwise steps per element.  `streams` independent accumulator
    chains expose ILP (a single dependent chain measures ALU latency,
    not throughput — the first version of this bench under-read the
    ceiling 5x that way)."""

    @jax.jit
    def body(x):
        ys = [x + jnp.uint32(3 * s + 1) for s in range(streams)]
        for i in range(k_steps // streams):
            ys = [step(y, i) for y in ys]
        out = ys[0]
        for y in ys[1:]:
            out = out ^ y
        return out

    x = jnp.arange(1 << n_log, dtype=jnp.uint32)

    def run():
        y = x
        for _ in range(reps):
            y = body(y)
        jax.device_get(y[:1])

    dt = _sample(run)
    ops = (k_steps // streams) * streams * ops_per_step * (1 << n_log) * reps
    return ops / dt


def measure_vpu_mul(n_log=22, k_steps=2048):
    """uint32 multiply throughput (the rate that binds conv_acc).
    Work per dispatch (2^22 x 2048 ops) is sized >> the ~3.5 ms tunnel
    dispatch overhead that polluted smaller configurations."""
    return _chain_rate(
        lambda y, i: y * jnp.uint32(0x9E3779B1 + 2 * i), n_log, k_steps, 1
    )


def measure_vpu_alu(n_log=22, k_steps=2048):
    """add/xor/shift/and throughput (carry chains, masks, selects)."""
    return _chain_rate(
        lambda y, i: ((y + jnp.uint32(i)) ^ (y >> 7)) & jnp.uint32(0xFFFFFF),
        n_log,
        k_steps,
        4,
    )


def measure_hbm_bw(n_log=26, k_iters=64):
    """Streaming read+write bandwidth.  The pass loop runs INSIDE one
    dispatch as a lax.fori_loop (XLA cannot fuse across while-loop
    iterations, so each iteration is a real read-4B + write-4B HBM pass
    over the loop carry) — per-dispatch tunnel overhead amortizes over
    k_iters passes."""
    from jax import lax

    @functools.partial(jax.jit, donate_argnums=0)
    def body(x):
        return lax.fori_loop(
            0, k_iters, lambda i, y: y + jnp.uint32(2 * i + 1), x
        )

    x = jnp.arange(1 << n_log, dtype=jnp.uint32)
    y = body(x)

    def run():
        nonlocal y
        y = body(y)
        jax.device_get(y[:1])

    dt = _sample(run)
    return 8 * (1 << n_log) * k_iters / dt


def measure_lerp_rate(field, n_log=23, reps=12):
    """The in-place capacity fold kernel: n_log-pair folds chained."""
    from zk_tpu.fields import device as dev
    from zk_tpu.sumcheck import capacity as C

    L = field.n_limbs
    n = 1 << (n_log + 1)

    @jax.jit
    def make(key):
        bits = jax.random.bits(key, (1, L, n), dtype=jnp.uint32)
        limbs = bits & jnp.uint32(0xFFFF)
        top = 0x1FFF if field.p >> 250 else 0x7FFF
        return limbs.at[0, L - 1].set(limbs[0, L - 1] & jnp.uint32(top))

    stack = make(jax.random.key(5))
    r = jnp.asarray(dev.const_limbs(field, 123456789)).reshape(L, 1)

    def run():
        st = stack + jnp.uint32(0)  # clone: _fold_cap donates its stack
        for _ in range(reps):
            # full-width fold at the SAME size (size operand = n): each
            # dispatch is 2^n_log lerps over the same capacity buffer
            # (the stale back half holds valid limbs, so re-folding at
            # full width is numerically safe junk — pure timing)
            st = C._fold_cap(field, 1, n, n, st, r)
        jax.device_get(st[:1, :1, :1])

    dt = _sample(run)
    return (1 << n_log) * reps / dt


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zk_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    log(f"devices: {jax.devices()}")

    mul_rate = measure_vpu_mul()
    log(f"measured VPU uint32 MULTIPLY rate: {mul_rate / 1e12:.2f} T ops/s")
    alu_rate = measure_vpu_alu()
    log(f"measured VPU uint32 add/logic rate: {alu_rate / 1e12:.2f} T ops/s")
    bw = measure_hbm_bw()
    log(f"measured HBM stream bandwidth:    {bw / 1e9:.0f} GB/s")

    for field, L, bytes_ in ((FR, 16, 192), (GOLDILOCKS, 4, 48)):
        muls = 2.5 * L * L
        others = 10 * L * L + 46 * L
        # two-class VPU ceiling: time/lerp = muls/mul_rate + others/alu_rate
        sol_vpu = 1.0 / (muls / mul_rate + others / alu_rate)
        sol_hbm = bw / bytes_
        bound = "VPU" if sol_vpu < sol_hbm else "HBM"
        lerp = measure_lerp_rate(field)
        sol = min(sol_vpu, sol_hbm)
        log(
            f"{field.name}: lerp = {muls:.0f} mul + {others:.0f} alu lane-ops "
            f"/ {bytes_} B -> SOL {sol_vpu / 1e9:.2f} G/s (VPU) vs "
            f"{sol_hbm / 1e9:.2f} G/s (HBM); {bound}-bound.  measured fold "
            f"kernel: {lerp / 1e9:.2f} G lerps/s = {100 * lerp / sol:.0f}% of "
            f"speed-of-light"
        )


if __name__ == "__main__":
    main()
