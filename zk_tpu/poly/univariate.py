"""Dense univariate polynomials over a prime field (host tier).

Mirrors polynomial/src/univariate_poly.rs.  This is verifier-side O(d^3)
work (round-poly interpolation at d+1 points, verifier.rs:58) — never on
the hot path, so exact Python-int arithmetic is the right tool: simple,
exact, and free of device round-trips for tiny degree-d data.

Coefficients are stored low-degree -> high-degree; the zero polynomial is
the empty list (univariate_poly.rs:83-85).
"""

from __future__ import annotations

from zk_tpu.fields.field import Field


class UnivariatePolynomial:
    def __init__(self, field: Field, coefficients: list[int]):
        self.field = field
        self.coefficients = [c % field.p for c in coefficients]

    # ------------------------------------------------------------- basics

    def is_zero(self) -> bool:
        return len(self.coefficients) == 0

    def degree(self) -> int:
        """univariate_poly.rs:88-94 (zero poly reports degree 0)."""
        return max(0, len(self.coefficients) - 1)

    def evaluate(self, x: int) -> int:
        """Horner evaluation (univariate_poly.rs:29-40)."""
        f = self.field
        acc = 0
        for c in reversed(self.coefficients):
            acc = (acc * x + c) % f.p
        return acc

    # ------------------------------------------------------- interpolation

    @classmethod
    def interpolate(cls, field: Field, ys: list[int]) -> "UnivariatePolynomial":
        """Interpolate over the set [0, 1, 2, ...] (univariate_poly.rs:43-49).

        The verifier reconstructs round polys from their d+1 evaluations
        at 0..=d this way (verifier.rs:58).
        """
        xs = list(range(len(ys)))
        return cls.interpolate_xy(field, xs, ys)

    @classmethod
    def interpolate_xy(cls, field: Field, xs, ys) -> "UnivariatePolynomial":
        """Lagrange interpolation via basis-poly products
        (univariate_poly.rs:54-80)."""
        result = cls(field, [])
        for i, (x_i, y_i) in enumerate(zip(xs, ys)):
            basis = cls(field, [1])
            for j, x_j in enumerate(xs):
                if j == i:
                    continue
                numerator = cls(field, [field.neg(x_j), 1])  # (x - x_j)
                denom_inv = field.inv(field.sub(x_i, x_j))
                basis = basis * (numerator * cls(field, [denom_inv]))
            result = result + (basis * cls(field, [y_i]))
        return result

    # ------------------------------------------------------------ algebra

    def __add__(self, other: "UnivariatePolynomial") -> "UnivariatePolynomial":
        if self.is_zero():
            return UnivariatePolynomial(self.field, list(other.coefficients))
        if other.is_zero():
            return UnivariatePolynomial(self.field, list(self.coefficients))
        f = self.field
        if len(self.coefficients) >= len(other.coefficients):
            longer, shorter = list(self.coefficients), other.coefficients
        else:
            longer, shorter = list(other.coefficients), self.coefficients
        for i, c in enumerate(shorter):
            longer[i] = f.add(longer[i], c)
        return UnivariatePolynomial(f, longer)

    def __mul__(self, other: "UnivariatePolynomial") -> "UnivariatePolynomial":
        """Schoolbook O(n^2) product (univariate_poly.rs:186-209)."""
        if self.is_zero() or other.is_zero():
            return UnivariatePolynomial(self.field, [])
        f = self.field
        out = [0] * (self.degree() + other.degree() + 1)
        for i, a in enumerate(self.coefficients):
            for j, b in enumerate(other.coefficients):
                out[i + j] = (out[i + j] + a * b) % f.p
        return UnivariatePolynomial(f, out)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, UnivariatePolynomial)
            and self.field.p == other.field.p
            and self.coefficients == other.coefficients
        )

    def __repr__(self):
        return f"UnivariatePolynomial({self.field.name}, {self.coefficients})"

    # --------------------------------------------------------- identities

    @classmethod
    def additive_identity(cls, field: Field) -> "UnivariatePolynomial":
        return cls(field, [])

    @classmethod
    def multiplicative_identity(cls, field: Field) -> "UnivariatePolynomial":
        return cls(field, [1])

    # ------------------------------------------------------ serialization

    def to_bytes(self) -> bytes:
        """Concat of canonical BE coefficient bytes (univariate_poly.rs:144-150)."""
        return self.field.elements_to_bytes(self.coefficients)

    # ------------------------------------------- Polynomial-trait parity
    # (univariate_poly.rs:102-155)

    def n_vars(self) -> int:
        return 1

    def evaluate_slice(self, assignments: list[int]) -> int:
        """univariate_poly.rs:106-111."""
        if not assignments:
            raise ValueError("empty assignment, cannot evaluate univariate polynomial")
        return self.evaluate(assignments[0])

    def partial_evaluate_selectors(self, assignments) -> "UnivariatePolynomial":
        """Selector-based partial evaluation (univariate_poly.rs:113-135):
        a [True] selector collapses to the constant poly, [False] is a
        no-op clone."""
        if len(assignments) != 1:
            raise ValueError(
                "cannot partially evaluate a univariate polynomial at more than 1 variable"
            )
        selector, value = assignments[0]
        if len(selector) != 1:
            raise ValueError("partial evaluation selector should point to only 1 variable")
        if selector[0]:
            return UnivariatePolynomial(self.field, [self.evaluate(value)])
        return UnivariatePolynomial(self.field, list(self.coefficients))

    def relabel(self) -> "UnivariatePolynomial":
        return self

    def to_univariate(self) -> "UnivariatePolynomial":
        return UnivariatePolynomial(self.field, list(self.coefficients))
