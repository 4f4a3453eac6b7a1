"""Headline benchmark: sumcheck prover throughput on one TPU chip.

Measures a full prove_partial over an n-variable BLS12-381 Fr multilinear
(BASELINE.json config 4 scaled to the 2^24 north star) on the real chip
and reports field-mults/sec/chip.

vs_baseline: the reference publishes no numbers (BASELINE.md — its
readme is links only and `published` is empty), so the denominator is
the analytic CPU yardstick the survey derives: a generous 3.0e7
mults/sec single-core arkworks BLS12-381 Fr Montgomery-mul rate times
the same deterministic op count (~2*2^n mults for the degree-1 prover:
one lerp per index pair for the real fold, 0/1 sample points free —
evaluation_form.rs:54-79, prover.rs:44-68).

Env knobs: ZK_TPU_BENCH_N (default 24), ZK_TPU_BENCH_REPS (default 3).
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
    reps = int(os.environ.get("ZK_TPU_BENCH_REPS", "3"))

    import numpy as np

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    from zk_tpu.fields import BLS12_381_FR as FR
    from zk_tpu.fields import device as dev
    from zk_tpu.poly import MLE, ProductPoly
    from zk_tpu.sumcheck import SumcheckProver
    from zk_tpu.utils import sumcheck_prover_mults

    # generate the table ON DEVICE (a 2^26 table is 4 GiB — host->device
    # transfer would dominate); random 16-bit limbs with the top 3 bits of
    # the high limb cleared are valid field elements (< 2^253 < p)
    @jax.jit
    def make_table(key):
        bits = jax.random.bits(key, (FR.n_limbs, 1 << n), dtype=jnp.uint32)
        limbs = bits & jnp.uint32(0xFFFF)
        return limbs.at[FR.n_limbs - 1].set(limbs[FR.n_limbs - 1] & jnp.uint32(0x1FFF))

    log(f"generating 2^{n} table on device ...")
    poly = MLE(FR, n, make_table(jax.random.key(7)))
    pp = ProductPoly([poly])

    log(f"computing claimed sum for n={n} ...")
    s = dev.sum_mod(FR, poly.data, -1)
    total = dev.decode_ints(FR, s.reshape(FR.n_limbs, 1))[0]

    log("cold prove (compiles kernels) ...")
    t0 = time.time()
    proof, _ = SumcheckProver.prove_partial(pp, total, max_var_degree=1)
    t_cold = time.time() - t0
    log(f"cold: {t_cold:.2f}s")

    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        proof, _ = SumcheckProver.prove_partial(pp, total, max_var_degree=1)
        best = min(best, time.time() - t0)
        log(f"warm[{i}]: {time.time() - t0:.3f}s")

    # sanity: verifier must accept the emitted proof structure
    from zk_tpu.sumcheck import SumcheckVerifier

    sub = SumcheckVerifier.verify_partial(FR, proof)
    assert len(sub.challenges) == n

    mults = sumcheck_prover_mults(n, degree=1, k=1)
    value = mults / best
    baseline = ARKWORKS_CPU_MULTS_PER_SEC
    print(
        json.dumps(
            {
                "metric": f"sumcheck_prover_field_mults_per_sec_2^{n}_bls12_381_fr",
                "value": round(value, 1),
                "unit": "field-mults/s/chip",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
