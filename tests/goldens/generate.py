"""Regenerate the frozen golden vectors (run from repo root).

The north star requires bit-exactness with the Rust reference crates
(BASELINE.json:5); the exactness boundary is canonical BE serialization
(evaluation_form.rs:97-103, sumcheck/src/lib.rs:23-29) + the
reset-and-reseed Keccak transcript (transcript/src/lib.rs:20-30).  No
Rust toolchain exists in this image, so these files freeze the CURRENT
proof bytes and challenge sequences: any serialization or transcript
drift — one byte anywhere — fails tests/test_goldens.py loudly.

Run: `python tests/goldens/generate.py` (CPU; all prover tiers are
byte-identical, differential-tested elsewhere).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import random

    from zk_tpu.fields import BLS12_381_FR as FR
    from zk_tpu.gkr import GKRProver, gkr_proof_to_bytes
    from zk_tpu.poly import CoeffMultilinearPolynomial, MLE, ProductPoly
    from zk_tpu.sumcheck import SumcheckProver, proof_to_bytes

    sys.path.insert(0, os.path.join(HERE, ".."))
    from test_gkr import random_circuit

    out = {}

    # case 1+3: p = 2ab + 3bc (sumcheck/src/lib.rs:40-62,105-113)
    evals = CoeffMultilinearPolynomial.new(
        FR, 3, [(2, [True, True, False]), (3, [False, True, True])]
    ).to_evaluation_form()
    pp = ProductPoly([MLE.new(FR, 3, evals)])
    proof = SumcheckProver.prove(pp, 10, max_var_degree=1)
    open(os.path.join(HERE, "sumcheck_2ab3bc_prove.bin"), "wb").write(
        proof_to_bytes(FR, proof)
    )
    partial, challenges = SumcheckProver.prove_partial(pp, 10, max_var_degree=1)
    open(os.path.join(HERE, "sumcheck_2ab3bc_partial.bin"), "wb").write(
        proof_to_bytes(FR, partial)
    )
    out["partial_challenges"] = [hex(c) for c in challenges]

    # case 2: degree-2 product (sumcheck/src/lib.rs:65-102)
    p1 = MLE.new(
        FR,
        2,
        CoeffMultilinearPolynomial.new(
            FR, 2, [(2, [True, False]), (0, [False, True]), (3, [False, False])]
        ).to_evaluation_form(),
    )
    p2 = MLE.new(
        FR,
        2,
        CoeffMultilinearPolynomial.new(FR, 2, [(1, [True, True])]).to_evaluation_form(),
    )
    proof2 = SumcheckProver.prove(ProductPoly([p1, p2]), 5, max_var_degree=2)
    open(os.path.join(HERE, "sumcheck_deg2_prove.bin"), "wb").write(
        proof_to_bytes(FR, proof2)
    )

    # case 4: wrong claimed sum — the PROOF bytes are still deterministic
    # (the verifier rejecting them is tested in test_sumcheck.py)
    proof_bad = SumcheckProver.prove(pp, 12, max_var_degree=1)
    open(os.path.join(HERE, "sumcheck_wrong_sum_prove.bin"), "wb").write(
        proof_to_bytes(FR, proof_bad)
    )

    # GKR end-to-end proof on a seeded random circuit
    rng = random.Random(7)
    c = random_circuit(rng, depth=3, width=8, n_inputs=8)
    inputs = [rng.randrange(FR.p) for _ in range(8)]
    gproof, _ = GKRProver.prove(FR, c, inputs)
    open(os.path.join(HERE, "gkr_d3w8_prove.bin"), "wb").write(
        gkr_proof_to_bytes(FR, gproof)
    )

    with open(os.path.join(HERE, "challenges.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("goldens written to", HERE)


if __name__ == "__main__":
    main()
