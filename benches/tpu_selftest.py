"""On-chip differential self-test: run the TPU fast paths on the real
chip and check them against exact host-int oracles.

The pytest suite runs on the simulated CPU mesh (tests/conftest.py), so
the Pallas kernels and the axon-tunnel dispatch paths are only exercised
here and in bench.py.  Everything below is small (seconds warm) and
asserts exact values / byte-identical proofs.

Usage: python benches/tpu_selftest.py
"""

import random
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zk_tpu_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def main():
    from zk_tpu.fields import BLS12_381_FR as FR, GOLDILOCKS
    from zk_tpu.fields import device as dev
    from zk_tpu.gkr import GKRProver, GKRVerifier
    from zk_tpu.ntt import host_dft, ntt
    from zk_tpu.poly import MLE, ProductPoly
    from zk_tpu.sumcheck import SumcheckProver, SumcheckVerifier

    print(f"devices: {jax.devices()}", flush=True)
    rng = random.Random(20240817)

    # ---- MLE evaluate: fused fold chain (Pallas + jnp tail) vs host ints
    for n in (10, 13):
        vals = [rng.randrange(FR.p) for _ in range(1 << n)]
        point = [rng.randrange(FR.p) for _ in range(n)]
        cur = list(vals)
        for r in point:
            half = len(cur) // 2
            cur = [(cur[e] - r * (cur[e] - cur[e + half])) % FR.p for e in range(half)]
        got = MLE.new(FR, n, vals).evaluate(point)
        assert got == cur[0], f"MLE eval mismatch at n={n}"
        print(f"MLE eval n={n}: OK", flush=True)

    # ---- sumcheck: device-transcript tier vs host-int tier, byte-identical
    n = 12
    vals_a = [rng.randrange(FR.p) for _ in range(1 << n)]
    vals_b = [rng.randrange(FR.p) for _ in range(1 << n)]
    total = sum(FR.mul(a, b) for a, b in zip(vals_a, vals_b)) % FR.p
    pp = ProductPoly([MLE.new(FR, n, vals_a), MLE.new(FR, n, vals_b)])
    proof_dev, ch_dev = SumcheckProver.prove_partial(pp, total, device_transcript=True)
    proof_host, ch_host = SumcheckProver.prove_partial(
        pp, total, tail_size=1 << 30, device_transcript=False
    )
    assert proof_dev == proof_host and ch_dev == ch_host, "sumcheck tier mismatch"
    sub = SumcheckVerifier.verify_partial(FR, proof_dev)
    assert sub.challenges == ch_dev
    print(f"sumcheck tiers n={n}: byte-identical, OK", flush=True)

    # ---- degree-1 single-MLE sumcheck: exercises the fused
    # fold+half-sums Pallas round kernels (big + small variants)
    pp1 = ProductPoly([MLE.new(FR, n, vals_a)])
    total1 = sum(vals_a) % FR.p
    p1_dev, c1_dev = SumcheckProver.prove_partial(
        pp1, total1, max_var_degree=1, device_transcript=True
    )
    p1_host, c1_host = SumcheckProver.prove_partial(
        pp1, total1, max_var_degree=1, tail_size=1 << 30, device_transcript=False
    )
    assert p1_dev == p1_host and c1_dev == c1_host, "degree-1 tier mismatch"
    print(f"sumcheck degree-1 fused rounds n={n}: byte-identical, OK", flush=True)

    # ---- Pallas Keccak-f[1600] vs the pure-Python permutation
    import numpy as np
    import jax.numpy as jnp
    from zk_tpu.transcript import device as tdev
    from zk_tpu.transcript.keccak import keccak_f1600

    lanes = [rng.randrange(1 << 64) for _ in range(25)]
    lo = jnp.asarray(np.array([l & 0xFFFFFFFF for l in lanes], dtype=np.uint32))
    hi = jnp.asarray(np.array([l >> 32 for l in lanes], dtype=np.uint32))
    plo, phi = jax.device_get(tdev._keccak_f1600_pallas(lo, hi))
    got = [int(plo[i]) | (int(phi[i]) << 32) for i in range(25)]
    assert got == keccak_f1600(lanes), "pallas keccak mismatch"
    print("pallas keccak-f1600: OK", flush=True)

    # ---- GKR: linear-time device prover vs dense oracle, byte-identical
    from tests.test_gkr import random_circuit  # seeded builder

    c = random_circuit(random.Random(7), depth=3, width=8, n_inputs=8)
    inputs = [rng.randrange(FR.p) for _ in range(8)]
    fast, _ = GKRProver.prove(FR, c, inputs)
    dense, _ = GKRProver.prove_dense(FR, c, inputs)
    assert fast == dense, "GKR libra/dense proof mismatch"
    assert GKRVerifier.verify(FR, c, inputs, fast)
    print("GKR libra == dense: OK", flush=True)

    # ---- NTT: device ladder vs O(n^2) host DFT
    for n in (256, 1 << 13):
        vals = [rng.randrange(GOLDILOCKS.p) for _ in range(n)]
        got = ntt(GOLDILOCKS, vals)
        if n <= 256:
            assert got == host_dft(GOLDILOCKS, vals), "NTT mismatch vs DFT"
        else:
            from zk_tpu.ntt import intt

            assert intt(GOLDILOCKS, got) == [v % GOLDILOCKS.p for v in vals]
        print(f"NTT n={n}: OK", flush=True)

    print("TPU SELFTEST PASSED", flush=True)


if __name__ == "__main__":
    main()
