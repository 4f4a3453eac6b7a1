"""Products (and sums of products) of same-arity multilinear polynomials.

ProductPoly mirrors polynomial/src/product_poly.rs: P(x) = A(x)·B(x)·…
held un-expanded; sumcheck partial-evaluates each factor and multiplies
the tables elementwise (prod_reduce) instead of materializing the
degree-k product.

SumOfProducts generalizes to Σ_t Π_j f_{t,j} — the shape GKR's per-layer
polynomial add~(r,b,c)·(W(b)+W(c)) + mul~(r,b,c)·W(b)·W(c) needs
(SURVEY.md §2 #13); the reference's sumcheck only handles a single
product term, ours treats ProductPoly as the 1-term case.
"""

from __future__ import annotations

import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field
from zk_tpu.poly.mle import MLE


class ProductPoly:
    """Product of one or more same-arity MLEs (product_poly.rs:7-10)."""

    def __init__(self, polynomials: list[MLE]):
        if len(polynomials) == 0:
            raise ValueError("cannot create product polynomial from empty polynomials")
        n_vars = polynomials[0].n_vars
        if any(p.n_vars != n_vars for p in polynomials):
            raise ValueError(
                "cannot create product polynomial from polynomial that don't share "
                "the same number of variables"
            )
        self.field: Field = polynomials[0].field
        self.n_vars = n_vars
        self.polynomials = polynomials

    def evaluate(self, assignments: list[int]) -> int:
        """Product of member evaluations (product_poly.rs:36-44)."""
        if len(assignments) != self.n_vars:
            raise ValueError("evaluate must assign to all variables")
        f = self.field
        out = 1
        for poly in self.polynomials:
            out = f.mul(out, poly.evaluate(assignments))
        return out

    def partial_evaluate(self, initial_var: int, assignments: list[int]) -> "ProductPoly":
        """Member-wise partial evaluation (product_poly.rs:48-63)."""
        return ProductPoly(
            [p.partial_evaluate(initial_var, assignments) for p in self.polynomials]
        )

    def prod_reduce(self) -> jnp.ndarray:
        """Elementwise product of the member tables (product_poly.rs:66-74);
        returns (L, 2^n) Montgomery limbs."""
        result = self.polynomials[0].data
        for poly in self.polynomials[1:]:
            result = dev.mont_mul(self.field, result, poly.data)
        return result

    def prod_reduce_ints(self) -> list[int]:
        return dev.decode_ints(self.field, self.prod_reduce())

    def to_bytes(self) -> bytes:
        """Concat of member to_bytes (product_poly.rs:77-83)."""
        return b"".join(p.to_bytes() for p in self.polynomials)

    def stacked(self) -> jnp.ndarray:
        """Factor tables stacked as (k, L, 2^n) for fused round kernels."""
        return jnp.stack([p.data for p in self.polynomials])

    @property
    def max_degree(self) -> int:
        """Per-variable degree bound = number of factors."""
        return len(self.polynomials)

    def __eq__(self, other) -> bool:
        if not isinstance(other, ProductPoly):
            return NotImplemented
        return (
            self.n_vars == other.n_vars
            and len(self.polynomials) == len(other.polynomials)
            and all(a == b for a, b in zip(self.polynomials, other.polynomials))
        )


class SumOfProducts:
    """Σ_t Π_j f_{t,j}: a list of ProductPoly terms over the same variables.

    The sumcheck round polynomial degree is max over terms of the factor
    count.  This is the GKR layer polynomial's native shape.
    """

    def __init__(self, terms: list[ProductPoly]):
        if len(terms) == 0:
            raise ValueError("cannot create sum of products from empty terms")
        n_vars = terms[0].n_vars
        if any(t.n_vars != n_vars for t in terms):
            raise ValueError("sum of products terms must share the same number of variables")
        self.field = terms[0].field
        self.n_vars = n_vars
        self.terms = terms

    def evaluate(self, assignments: list[int]) -> int:
        f = self.field
        out = 0
        for t in self.terms:
            out = f.add(out, t.evaluate(assignments))
        return out

    def partial_evaluate(self, initial_var: int, assignments: list[int]) -> "SumOfProducts":
        return SumOfProducts(
            [t.partial_evaluate(initial_var, assignments) for t in self.terms]
        )

    def sum_reduce(self) -> jnp.ndarray:
        """Σ_t prod_reduce(term): (L, 2^n) Montgomery limbs."""
        acc = self.terms[0].prod_reduce()
        for t in self.terms[1:]:
            acc = dev.add_mod(self.field, acc, t.prod_reduce())
        return acc

    def to_bytes(self) -> bytes:
        return b"".join(t.to_bytes() for t in self.terms)

    @property
    def max_degree(self) -> int:
        return max(t.max_degree for t in self.terms)
