"""Scaling-efficiency harness: sharded sumcheck prover across mesh sizes.

Reports prover wall time and relative efficiency at 1/2/4/.../N devices
(the 1-chip / 1-host / N-host scaling numbers of BASELINE.json:2).  On
this CI image the mesh is XLA's simulated host-platform device set; the
identical code runs on a real ICI/DCN mesh — point JAX at the slice and
rerun.

Usage: python benches/scaling.py [n_vars] [field]
"""

import os
import sys
import time

sys.path.insert(0, ".")

# default to the simulated 8-device CPU mesh (the image's sitecustomize
# forces the single-chip axon TPU platform otherwise); set
# ZK_TPU_SCALING_TPU=1 on a real multi-chip slice
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("ZK_TPU_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

from zk_tpu.fields import BLS12_381_FR, GOLDILOCKS
from zk_tpu.parallel import ShardedSumcheckProver, make_mesh
from zk_tpu.poly import MLE, ProductPoly
from zk_tpu.sumcheck import SumcheckProver
from zk_tpu.utils import sumcheck_prover_mults

FIELDS = {"goldilocks": GOLDILOCKS, "bls12_381": BLS12_381_FR}

# --- analytic scaling model (BASELINE.md "Scaling model") ---------------
# Per-chip fold throughput measured on the v5e (capacity kernels,
# BLS12-381 Fr): a 2^24 prove touches ~2^25 live elements summed over
# its halving rounds in ~50 ms on-device, so the effective rate is
# ~670 M processed elements/s/chip; T_ROUND is the fixed per-round
# overhead (dispatch + psum latency + replicated sponge).
V5E_RATE = 670e6  # processed elements / s / chip (summed over rounds)
T_ROUND = 25e-6  # s: psum (~136 B payload) + dispatch + sponge


def predicted_prove_s(n: int, d: int, rate=V5E_RATE, t_round=T_ROUND) -> float:
    """Model: sum over device rounds of (live local size)/rate + fixed
    per-round cost; host tail below max(128, 2d) is negligible."""
    tail = max(128, 2 * d)
    total, g = 0.0, 1 << n
    while g > tail:
        total += (g / d) / rate + t_round
        g //= 2
    return total


def predicted_efficiency(n: int, d: int) -> float:
    t1 = predicted_prove_s(n, 1)
    td = predicted_prove_s(n, d)
    return t1 / (td * d)


def print_model():
    print("analytic model (v5e constants: "
          f"{V5E_RATE / 1e6:.0f} M elems/s/chip, {T_ROUND * 1e6:.0f} us/round):")
    for n in (24, 26):
        row = "  2^%d:" % n
        for d in (8, 32):
            row += f"  {d} chips {predicted_efficiency(n, d) * 100:5.1f}%"
        print(row)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    field = FIELDS[sys.argv[2]] if len(sys.argv) > 2 else GOLDILOCKS

    import random

    rng = random.Random(0)
    evals = [rng.randrange(field.p) for _ in range(1 << n)]
    poly = MLE.new(field, n, evals)
    pp = ProductPoly([poly])
    total = sum(evals) % field.p

    # single-device reference
    SumcheckProver.prove_partial(pp, total, max_var_degree=1)  # warm
    t0 = time.time()
    SumcheckProver.prove_partial(pp, total, max_var_degree=1)
    t1 = time.time() - t0
    print(f"1 device : {t1 * 1e3:8.1f} ms  (reference)")

    n_dev = len(jax.devices())
    d = 2
    while d <= n_dev:
        mesh = make_mesh(d)
        ShardedSumcheckProver.prove_partial(mesh, pp, total, max_var_degree=1)  # warm
        t0 = time.time()
        proof, _ = ShardedSumcheckProver.prove_partial(mesh, pp, total, max_var_degree=1)
        td = time.time() - t0
        eff = t1 / (td * d)
        pred = predicted_efficiency(n, d)
        print(
            f"{d} devices: {td * 1e3:8.1f} ms  efficiency {eff * 100:5.1f}%"
            f"  (model @ v5e: {pred * 100:5.1f}%)"
        )
        d *= 2

    mults = sumcheck_prover_mults(n, 1, 1)
    print(f"(analytic op count: {mults / 1e6:.1f} M field mults)")
    print("NOTE: measured columns above are simulated-CPU-mesh wall time "
          "(no ICI); the model column is the ICI prediction to check the "
          "day real multi-chip hardware appears.")
    print_model()


if __name__ == "__main__":
    main()
