"""Field layer: specs + host arithmetic (this module) and device limb kernels.

Concrete fields mirror the ones the reference instantiates
(SURVEY.md §1 L1; polynomial/src/univariate_poly.rs:237-241,
sumcheck/src/lib.rs:35, fft/src/lib.rs:75-76) plus Goldilocks as the
FFT-friendly 64-bit field called for by BASELINE.json config 1.
"""

from zk_tpu.fields.field import Field, LIMB_BITS, LIMB_MASK  # noqa: F401

# 17-element test field: modulus 17, generator 3
# (reference: polynomial/src/univariate_poly.rs:237-241)
F17 = Field(name="F17", p=17, generator=3)

# Goldilocks p = 2^64 - 2^32 + 1, generator 7, 2-adicity 32
GOLDILOCKS = Field(name="Goldilocks", p=(1 << 64) - (1 << 32) + 1, generator=7)

# BLS12-381 scalar field (ark-bls12-381 Fr): 255 bits, generator 7, 2-adicity 32
BLS12_381_FR = Field(
    name="BLS12-381-Fr",
    p=0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    generator=7,
)

# BLS12-377 scalar field (ark-bls12-377 Fr): 253 bits, generator 22, 2-adicity 47
# (used by the reference fft test for its high 2-adicity, fft/src/lib.rs:75-76)
BLS12_377_FR = Field(
    name="BLS12-377-Fr",
    p=0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001,
    generator=22,
)

ALL_FIELDS = (F17, GOLDILOCKS, BLS12_381_FR, BLS12_377_FR)
