"""GKR end-to-end benchmark (BASELINE.json config 5).

Proves a deep, wide layered circuit over BLS12-381 Fr with the
linear-time (two-phase / Libra) device prover and verifies the proof.
The dense O(4^k)-per-layer oracle cannot touch these sizes (a 2^14-gate
layer would need 2^28-entry (b, c) tables); the linear-time path runs
O(2^k + gates) per layer, so the whole proof is streaming-rate work.

Usage: python benches/gkr.py [log2_width] [depth]
Prints per-phase timings and a gates/sec summary line.
"""

import random
import sys
import time

sys.path.insert(0, ".")

from zk_tpu.fields import BLS12_381_FR as FR
from zk_tpu.gkr import GKRProver, GKRVerifier
from zk_tpu.gkr.circuit import Circuit, Gate


def build_circuit(log2_width: int, depth: int, seed: int = 42) -> Circuit:
    rng = random.Random(seed)
    width = 1 << log2_width
    layers = []
    below = width  # inputs
    for _ in range(depth):
        layers.append(
            [
                Gate(
                    "add" if rng.random() < 0.5 else "mul",
                    rng.randrange(below),
                    rng.randrange(below),
                )
                for _ in range(width)
            ]
        )
        below = width
    layers.reverse()
    return Circuit(layers=layers, n_inputs=width)


def main():
    log2_width = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    width = 1 << log2_width
    n_gates = width * depth

    t0 = time.perf_counter()
    circuit = build_circuit(log2_width, depth)
    rng = random.Random(1)
    inputs = [rng.randrange(FR.p) for _ in range(width)]
    print(f"circuit: {depth} layers x 2^{log2_width} gates = {n_gates} gates "
          f"(build {time.perf_counter() - t0:.2f}s)")

    t0 = time.perf_counter()
    proof, _ = GKRProver.prove(FR, circuit, inputs)
    cold = time.perf_counter() - t0
    print(f"prove cold: {cold:.2f}s")

    t0 = time.perf_counter()
    proof, _ = GKRProver.prove(FR, circuit, inputs)
    warm = time.perf_counter() - t0
    print(f"prove warm: {warm:.3f}s ({n_gates / warm / 1e3:.1f} K gates/s)")

    t0 = time.perf_counter()
    ok = GKRVerifier.verify(FR, circuit, inputs, proof)
    vt = time.perf_counter() - t0
    print(f"verify: {vt:.3f}s ok={ok}")
    assert ok

    import json

    print(json.dumps({
        "metric": f"gkr_prove_gates_per_sec_2^{log2_width}x{depth}_bls12_381_fr",
        "value": round(n_gates / warm, 1),
        "unit": "gates/s/chip",
        "prove_warm_s": round(warm, 3),
        "verify_s": round(vt, 3),
    }))


if __name__ == "__main__":
    main()
