"""Headline benchmark: field-mults/sec/chip on the reference's own workload.

The reference's only benchmark harness is MLE full evaluation at 18-21
vars, differential against arkworks (polynomial/benches/
polynomial_evaluation.rs; SURVEY.md §6) — with a deterministic op count
of ~2^n field mults (one per index pair, evaluation_form.rs:68).  We run
the same workload at the driver's 2^24 scale on one chip: the whole
n-round fold is a pipelined chain of Pallas fold kernels with a single
sync, so this measures genuine device throughput (the north star's
"field-mults/sec/chip", BASELINE.json:2).

The sumcheck-prover end-to-end time at the same size (north-star metric
#2 — includes the mandatory per-round Fiat-Shamir host syncs, which in
this harness traverse the axon tunnel) is printed to stderr for the
record.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is the analytic CPU yardstick: a generous 3.0e7 mults/sec
single-core arkworks BLS12-381 Fr Montgomery-mul rate on the identical
op count.

Env knobs: ZK_TPU_BENCH_N (default 24), ZK_TPU_BENCH_REPS (default 5).
"""

import json
import os
import sys
import time


ARKWORKS_CPU_MULTS_PER_SEC = 3.0e7


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("ZK_TPU_BENCH_N", "24"))
    reps = int(os.environ.get("ZK_TPU_BENCH_REPS", "5"))

    import jax
    import jax.numpy as jnp

    # cache TPU kernel compiles across bench runs (cold-start dominated by
    # per-size fold/round kernel compilation otherwise)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zk_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    log(f"devices: {jax.devices()}")

    from zk_tpu.fields import BLS12_381_FR as FR
    from zk_tpu.fields import device as dev
    from zk_tpu.poly import MLE, ProductPoly
    from zk_tpu.sumcheck import SumcheckProver
    from zk_tpu.utils import mle_eval_mults, sumcheck_prover_mults

    @jax.jit
    def make_table(key):
        bits = jax.random.bits(key, (FR.n_limbs, 1 << n), dtype=jnp.uint32)
        limbs = bits & jnp.uint32(0xFFFF)
        return limbs.at[FR.n_limbs - 1].set(limbs[FR.n_limbs - 1] & jnp.uint32(0x1FFF))

    log(f"generating 2^{n} table on device ...")
    poly = MLE(FR, n, make_table(jax.random.key(7)))
    point = [(0x1234567 + i * 0xDEADBEEF) % FR.p for i in range(n)]

    # ---- metric: MLE full evaluation (single pipelined dispatch chain)
    log("mle eval cold (compiles fold kernels) ...")
    t0 = time.time()
    v = poly.evaluate(point)
    log(f"cold: {time.time() - t0:.2f}s")
    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        v2 = poly.evaluate(point)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"warm[{i}]: {dt:.3f}s")
    assert v2 == v
    mults = mle_eval_mults(n)
    value = mults / best

    # ---- for the record: sumcheck prover end-to-end at the same size
    try:
        s = dev.sum_mod(FR, poly.data, -1)
        total = dev.decode_ints(FR, s.reshape(FR.n_limbs, 1))[0]
        pp = ProductPoly([poly])
        t0 = time.time()
        SumcheckProver.prove_partial(pp, total, max_var_degree=1)
        log(f"sumcheck prove_partial 2^{n} cold: {time.time() - t0:.2f}s")
        t0 = time.time()
        SumcheckProver.prove_partial(pp, total, max_var_degree=1)
        t_sc = time.time() - t0
        sc_mults = sumcheck_prover_mults(n, degree=1, k=1)
        log(
            f"sumcheck prove_partial 2^{n} warm: {t_sc:.3f}s "
            f"({sc_mults / t_sc / 1e6:.0f} M mults/s incl per-round host syncs)"
        )
    except Exception as e:  # keep the headline metric robust
        log(f"sumcheck timing skipped: {e}")

    print(
        json.dumps(
            {
                "metric": f"mle_eval_field_mults_per_sec_2^{n}_bls12_381_fr",
                "value": round(value, 1),
                "unit": "field-mults/s/chip",
                "vs_baseline": round(value / ARKWORKS_CPU_MULTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
