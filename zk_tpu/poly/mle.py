"""Dense evaluation-form multilinear polynomials — the device-tier hot type.

Mirrors polynomial/src/multilinear/evaluation_form.rs.  The table of all
2^n hypercube evaluations lives on device as a Montgomery limb tensor of
shape (L, 2^n), element axis last (TPU lanes).  Variable 0 is the most
significant bit of the element index (pairing_index.rs:2-9: index_pair
pairs i with i + 2^(n-1-index)), so folding variable v is a reshape to
(L, 2^v, 2, 2^(n-v-1)) and a lerp across the middle axis — contiguous
slices, no gathers, results front-compacted in natural order exactly like
the reference's in-place fold (evaluation_form.rs:54-79).

The full consecutive fold (evaluate / partial_evaluate) is one jitted
graph per (field, n_vars, initial_var, #assignments): n reshape+lerp
steps that XLA fuses; there is no per-round Python dispatch inside.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fold_kernel(field: Field, n_vars: int, initial_var: int, k: int, data, rs):
    """Fold k consecutive variables starting at initial_var.

    data: (L, 2^n_vars) Montgomery limbs.  rs: (k, L) Montgomery scalars.
    Returns (L, 2^(n_vars-k)).  Matches the reference loop
    evaluation_form.rs:54-79: each step pairs elements differing in the
    bit at position (n-1-initial_var) of the current (shrinking) index and
    lerps left - r*(left-right).
    """
    L = field.n_limbs
    x = data
    n = n_vars
    for i in range(k):
        a = 1 << initial_var
        b = 1 << (n - initial_var - 1)
        xr = x.reshape(L, a, 2, b)
        left = xr[:, :, 0, :]
        right = xr[:, :, 1, :]
        r = rs[i][:, None, None]  # (L, 1, 1)
        x = dev.lerp(field, left, right, r).reshape(L, a * b)
        n -= 1
    return x


def _fold_var0_fast(field: Field, data, assignments: list[int]):
    """TPU fast path for consecutive var-0 folds: ONE host->device upload
    of all fold scalars, then a chain of async in-place capacity-kernel
    dispatches (zk_tpu.sumcheck.capacity._fold_multi_cap) folding up to 4
    variables per HBM pass, with the jnp reshape+lerp ladder for the
    small tail — the caller's eventual decode is the only round-trip.
    Returns the folded (L, 2^(n-k)) tensor, or None to use the jnp
    ladder.

    The capacity kernels take the live table size as a scalar-prefetch
    operand with a dynamic grid, so every pass of the chain (and every
    future prove at this table size) reuses ONE compiled kernel —
    dispatch enqueue is ~30us, so the chain stays launch-cheap without
    fusing it into one giant program (which cost ~70s of cold tracing in
    round 2).
    """
    from zk_tpu.fields.pallas_kernels import on_tpu
    from zk_tpu.sumcheck import capacity as C

    n = data.shape[-1]
    if not on_tpu() or n < 2 * C.BLOCK:
        return None
    L = field.n_limbs
    k = len(assignments)
    rs = np.empty((k, L), dtype=np.uint32)
    for i, a in enumerate(assignments):
        rs[i] = dev.const_limbs(field, a)
    rs_dev = jnp.asarray(rs)  # single upload
    # reshape materializes a fresh (1, L, n) buffer — the chain folds it
    # in place (donated + pallas-aliased) without touching `data`
    stack = jnp.reshape(data, (1, L, n))
    size, i = n, 0
    while i < k and size >= 2 * C.BLOCK:
        # fold up to 4 variables per pass (lerp tree on registers: same
        # multiply count as single folds, ~4x less HBM traffic), keeping
        # the output at least one BLOCK of lanes
        f = min(4, k - i, size.bit_length() - 1 - (C.BLOCK.bit_length() - 1))
        f = max(f, 1)
        stack = C._fold_multi_cap(field, f, n, size, stack, rs_dev[i : i + f].T)
        size >>= f
        i += f
    out = stack[0, :, :size]
    if i < k:
        out = _fold_kernel(field, size.bit_length() - 1, 0, k - i, out, rs_dev[i:])
    return out


class MLE:
    """MultiLinearPolynomial in dense evaluation form (device tier)."""

    def __init__(self, field: Field, n_vars: int, data: jnp.ndarray):
        """data: (L, 2^n_vars) uint32 Montgomery limbs.  Use `new` to build
        from ints with validation."""
        self.field = field
        self.n_vars = n_vars
        self.data = data

    # ------------------------------------------------------- constructors

    @classmethod
    def new(cls, field: Field, n_vars: int, evaluations: list[int]) -> "MLE":
        """Validates len == 2^n_vars (evaluation_form.rs:15-27)."""
        if len(evaluations) != (1 << n_vars):
            raise ValueError("evaluation vec len should equal 2^n_vars")
        return cls(field, n_vars, dev.encode_ints(field, evaluations))

    @classmethod
    def from_coeff(cls, coeff_poly) -> "MLE":
        """Build from a CoeffMultilinearPolynomial via the hypercube walk."""
        evals = coeff_poly.to_evaluation_form()
        return cls.new(coeff_poly.field, coeff_poly.n_vars, evals)

    # -------------------------------------------------------- evaluation

    def partial_evaluate(self, initial_var: int, assignments: list[int]) -> "MLE":
        """Fix len(assignments) consecutive variables starting at
        initial_var (evaluation_form.rs:40-80)."""
        k = len(assignments)
        if k == 0:
            return MLE(self.field, self.n_vars, self.data)
        if k > self.n_vars or initial_var >= self.n_vars:
            raise ValueError("partial evaluation out of range")
        if initial_var == 0:
            out = _fold_var0_fast(self.field, self.data, assignments)
            if out is not None:
                return MLE(self.field, self.n_vars - k, out)
        rs = jnp.stack(
            [jnp.asarray(dev.const_limbs(self.field, a)) for a in assignments]
        )
        out = _fold_kernel(self.field, self.n_vars, initial_var, k, self.data, rs)
        return MLE(self.field, self.n_vars - k, out)

    def evaluate(self, assignments: list[int]) -> int:
        """Full evaluation (evaluation_form.rs:83-89)."""
        if len(assignments) != self.n_vars:
            raise ValueError("evaluate must assign to all variables")
        if self.n_vars == 0:
            return dev.decode_ints(self.field, self.data)[0]
        reduced = self.partial_evaluate(0, assignments)
        return dev.decode_ints(self.field, reduced.data)[0]

    # ------------------------------------------------------------ access

    def evaluation_ints(self) -> list[int]:
        """Canonical evaluations as Python ints (evaluation_slice analog)."""
        return dev.decode_ints(self.field, self.data)

    def to_bytes(self) -> bytes:
        """Concat of canonical BE bytes (evaluation_form.rs:97-103)."""
        return dev.decode_bytes_be(self.field, self.data)

    def __eq__(self, other) -> bool:
        if not isinstance(other, MLE):
            return NotImplemented
        return (
            self.field.p == other.field.p
            and self.n_vars == other.n_vars
            and bool(jnp.array_equal(self.data, other.data))
        )

    def __repr__(self):
        return f"MLE({self.field.name}, n_vars={self.n_vars})"
