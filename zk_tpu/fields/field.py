"""Prime-field specification and exact host-side arithmetic.

The host tier works with plain Python ints modulo ``p`` — it backs the
verifier's tiny O(d^3) Lagrange interpolation, the sparse coefficient-form
polynomials, transcript challenge reduction, and test-vector generation.
The device tier (``zk_tpu.fields.device``) consumes the limb/Montgomery
constants precomputed here.

Serialization matches arkworks' ``into_bigint().to_bytes_be()``: the
canonical (non-Montgomery) integer is emitted big-endian, zero-padded to
the 64-bit-limb-aligned width of the modulus (reference:
polynomial/src/multilinear/evaluation_form.rs:97-103,
sumcheck/src/lib.rs:23-29).  Challenge derivation matches
``F::from_be_bytes_mod_order`` (transcript/src/lib.rs:27-30).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as _dc_field


LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


@dataclass(frozen=True)
class Field:
    """A prime field F_p with precomputed limb/Montgomery/FFT constants.

    Host ops take/return canonical Python ints in [0, p).  The device tier
    stores elements as ``n_limbs`` base-2^16 limbs in uint32 tensors, in
    Montgomery form (x * R mod p with R = 2^(16 * n_limbs)).
    """

    name: str
    p: int
    generator: int  # smallest quadratic non-residue used by arkworks' config
    # --- derived, filled in __post_init__ ---
    bits: int = _dc_field(init=False)
    n_limbs: int = _dc_field(init=False)  # base-2^16 device limbs
    n_bytes: int = _dc_field(init=False)  # canonical BE byte width (64-bit aligned)
    R: int = _dc_field(init=False)  # Montgomery radix 2^(16 * n_limbs)
    R2: int = _dc_field(init=False)  # R^2 mod p
    p_inv_neg: int = _dc_field(init=False)  # -p^-1 mod R
    two_adicity: int = _dc_field(init=False)  # s with p - 1 = 2^s * odd
    two_adic_root: int = _dc_field(init=False)  # generator^((p-1)/2^s) mod p

    def __post_init__(self):
        p = self.p
        object.__setattr__(self, "bits", p.bit_length())
        n_limbs = -(-p.bit_length() // LIMB_BITS)
        object.__setattr__(self, "n_limbs", n_limbs)
        # arkworks BigInt<N> with 64-bit limbs; to_bytes_be pads to 8*N bytes
        object.__setattr__(self, "n_bytes", 8 * (-(-p.bit_length() // 64)))
        R = 1 << (LIMB_BITS * n_limbs)
        object.__setattr__(self, "R", R)
        object.__setattr__(self, "R2", (R * R) % p)
        object.__setattr__(self, "p_inv_neg", (-pow(p, -1, R)) % R)
        s = (p - 1 & -(p - 1)).bit_length() - 1  # trailing zeros of p-1
        object.__setattr__(self, "two_adicity", s)
        object.__setattr__(
            self, "two_adic_root", pow(self.generator, (p - 1) >> s, p)
        )

    # ------------------------------------------------------------------ host ops

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def inv(self, a: int) -> int:
        if a % self.p == 0:
            raise ZeroDivisionError(f"no inverse of 0 in {self.name}")
        return pow(a, -1, self.p)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def from_int(self, a: int) -> int:
        """Canonicalize an arbitrary (possibly negative) int into [0, p)."""
        return a % self.p

    # -------------------------------------------------------- serialization

    def to_bytes_be(self, a: int) -> bytes:
        """Canonical big-endian bytes, arkworks ``into_bigint().to_bytes_be()``."""
        return (a % self.p).to_bytes(self.n_bytes, "big")

    def from_be_bytes_mod_order(self, data: bytes) -> int:
        """arkworks ``PrimeField::from_be_bytes_mod_order`` semantics."""
        return int.from_bytes(data, "big") % self.p

    def elements_to_bytes(self, elems) -> bytes:
        """Concat of canonical BE bytes (sumcheck/src/lib.rs:23-29)."""
        return b"".join(self.to_bytes_be(e) for e in elems)

    # ------------------------------------------------------------- FFT roots

    def get_root_of_unity(self, n: int) -> int:
        """arkworks ``FftField::get_root_of_unity(n)`` for power-of-two n.

        omega = two_adic_root_of_unity ^ (2^(s - log2 n))  (fft/src/lib.rs:6).
        """
        if n <= 0 or n & (n - 1):
            raise ValueError("n must be a power of two")
        log_n = n.bit_length() - 1
        if log_n > self.two_adicity:
            raise ValueError(
                f"{self.name} has 2-adicity {self.two_adicity}; no 2^{log_n} root"
            )
        return pow(self.two_adic_root, 1 << (self.two_adicity - log_n), self.p)

    # -------------------------------------------------------- limb conversion

    def to_limbs(self, a: int) -> list[int]:
        """Canonical int -> list of n_limbs base-2^16 limbs, little-endian."""
        a %= self.p
        return [(a >> (LIMB_BITS * i)) & LIMB_MASK for i in range(self.n_limbs)]

    def from_limbs(self, limbs) -> int:
        v = 0
        for i, l in enumerate(limbs):
            v += int(l) << (LIMB_BITS * i)
        return v % self.p

    def to_mont(self, a: int) -> int:
        return (a * self.R) % self.p

    def from_mont(self, a: int) -> int:
        return (a * pow(self.R, -1, self.p)) % self.p

    def __repr__(self):
        return f"Field({self.name}, {self.bits} bits)"

    def __hash__(self):
        return hash((self.name, self.p))
