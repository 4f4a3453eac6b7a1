"""zk_tpu — a TPU-native sumcheck/GKR proving framework.

A from-scratch JAX/XLA/Pallas implementation of the PAZK interactive-proof
stack (prime-field polynomial arithmetic, NTT, sumcheck, Fiat-Shamir
transcript, layered GKR), with the behavior of the Rust reference
`iammadab/zk` as its black-box specification.

Architecture (two tiers):
  * device tier — field elements as limb-decomposed uint32 tensors
    (limb axis first, hypercube/element axis on TPU lanes), Montgomery
    arithmetic, fused jitted round kernels, mesh-sharded tables with
    psum collectives (`zk_tpu.fields.device`, `zk_tpu.poly.mle`,
    `zk_tpu.sumcheck`, `zk_tpu.ntt`, `zk_tpu.parallel`).
  * host tier — exact Python-int field math for the verifier's O(d^3)
    interpolation, sparse coefficient-form polynomials, and the
    Keccak-256 Fiat-Shamir transcript (`zk_tpu.fields.field`,
    `zk_tpu.poly.univariate`, `zk_tpu.poly.coeff_mle`,
    `zk_tpu.transcript`).

Bit-exactness with the reference is defined at the canonical
big-endian byte boundary (arkworks `into_bigint().to_bytes_be()`
semantics) and at the transcript challenge stream.
"""

from zk_tpu.fields import (  # noqa: F401
    Field,
    F17,
    GOLDILOCKS,
    BLS12_381_FR,
    BLS12_377_FR,
)

__version__ = "0.1.0"
