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
