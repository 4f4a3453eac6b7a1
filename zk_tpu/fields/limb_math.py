"""Value-level limb arithmetic for Pallas TPU kernels.

All functions operate on Python lists of same-shaped uint32 jnp arrays
(one list entry per base-2^16 limb).  This is the in-kernel counterpart
of zk_tpu.fields.device: the jnp tier keeps a stacked slice-accumulate
formulation (small XLA graphs), while inside a Pallas kernel the limb
loops unroll onto register tiles where Mosaic schedules them directly.
The two implementations are differential-tested against each other and
against exact host ints (tests/test_pallas_kernels.py).

Invariants (see device.py module docstring for the full argument):
  * proper limbs are < 2^16; every 16x16 product is exact in uint32;
  * relaxed convolution columns accumulate <= 2L lo/hi terms < 2^22;
  * Montgomery reduce output u < 2p -> single conditional subtract.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from zk_tpu.fields.field import Field, LIMB_BITS, LIMB_MASK

_MASK = np.uint32(LIMB_MASK)
_B = LIMB_BITS
_ONE_CARRY = np.uint32(1 << LIMB_BITS)


def np_limbs(value: int, n: int) -> list[np.uint32]:
    return [np.uint32((value >> (_B * i)) & LIMB_MASK) for i in range(n)]


def conv_acc(xs: list, ys: list, n_cols: int) -> list:
    """Relaxed limb convolution columns of x * y, truncated to n_cols.

    ys entries may be numpy scalars (constants) or arrays.  Column k gets
    lo(x_i*y_j) for i+j == k and hi for i+j == k-1.
    """
    cols = [None] * n_cols
    def add(k, v):
        if k < n_cols:
            cols[k] = v if cols[k] is None else cols[k] + v
    for j in range(len(ys)):
        if j >= n_cols:
            break
        for i in range(len(xs)):
            if i + j >= n_cols:
                break
            prod = xs[i] * ys[j]
            add(i + j, prod & _MASK)
            add(i + j + 1, prod >> _B)
    zero = jnp.zeros_like(xs[0])
    return [zero if c is None else c for c in cols]


def carry_prop(cols: list):
    """Relaxed columns (< 2^32) -> proper 16-bit limbs + final carry."""
    out = []
    carry = None
    for c in cols:
        v = c if carry is None else c + carry
        out.append(v & _MASK)
        carry = v >> _B
    return out, carry


def sub_const_borrow(a: list, b_const: list[np.uint32]):
    """a - b for constant b; returns (diff limbs, borrow flag array)."""
    out = []
    borrow = None
    for i in range(len(a)):
        t = a[i] + (_ONE_CARRY - b_const[i])
        if borrow is not None:
            t = t - borrow
        out.append(t & _MASK)
        borrow = np.uint32(1) - (t >> _B)
    return out, borrow


def cond_sub_p(field: Field, limbs: list, extra_top=None) -> list:
    """If u >= p (extra_top = optional R-carry), subtract p."""
    p_const = np_limbs(field.p, field.n_limbs)
    diff, borrow = sub_const_borrow(limbs, p_const)
    ge = borrow == 0
    if extra_top is not None:
        ge = jnp.logical_or(ge, extra_top > 0)
    return [jnp.where(ge, d, u) for d, u in zip(diff, limbs)]


def add_mod(field: Field, a: list, b: list) -> list:
    limbs, carry = carry_prop([x + y for x, y in zip(a, b)])
    return cond_sub_p(field, limbs, extra_top=carry)


def sub_mod(field: Field, a: list, b: list) -> list:
    """a + (p - b) with one conditional subtract (b < p exact)."""
    p_const = np_limbs(field.p, field.n_limbs)
    c = []
    borrow = None
    for i in range(field.n_limbs):
        t = (p_const[i] + _ONE_CARRY) - b[i]
        if borrow is not None:
            t = t - borrow
        c.append(t & _MASK)
        borrow = np.uint32(1) - (t >> _B)
    limbs, carry = carry_prop([x + y for x, y in zip(a, c)])
    return cond_sub_p(field, limbs, extra_top=carry)


def mont_reduce(field: Field, t: list) -> list:
    """Montgomery-reduce a proper (L+1)-limb value T < R*p -> T/R mod p."""
    L = field.n_limbs
    ppl = np_limbs(field.p_inv_neg, L)
    pl = np_limbs(field.p, L)
    m, _ = carry_prop(conv_acc(t[:L], ppl, L))
    mp = conv_acc(m, pl, 2 * L + 1)
    _, low_carry = carry_prop([x + y for x, y in zip(mp[:L], t[:L])])
    u_cols = [mp[L] + t[L] + low_carry] + mp[L + 1 :]
    u, _top = carry_prop(u_cols)
    return cond_sub_p(field, u[:L], extra_top=u[L])


def mont_mul(field: Field, a: list, b: list) -> list:
    """(a * b * R^-1) mod p; a, b proper Montgomery limbs < p."""
    L = field.n_limbs
    cols = conv_acc(a, b, 2 * L + 1)
    t_lo, carry = carry_prop(cols[:L])
    t = t_lo + [cols[L] + carry] + cols[L + 1 :]
    # t is now L proper limbs + (L+1) relaxed columns; mont_reduce needs the
    # relaxed high part normalized lazily — fold it through the same path:
    ppl = np_limbs(field.p_inv_neg, L)
    pl = np_limbs(field.p, L)
    m, _ = carry_prop(conv_acc(t_lo, ppl, L))
    mp = conv_acc(m, pl, 2 * L + 1)
    _, low_carry = carry_prop([x + y for x, y in zip(mp[:L], t_lo)])
    u_cols = [t[L] + mp[L] + low_carry] + [
        t[L + 1 + i] + mp[L + 1 + i] for i in range(L)
    ]
    u, _top = carry_prop(u_cols)
    return cond_sub_p(field, u[:L], extra_top=u[L])


def mont_mul_const(field: Field, a: list, c: int) -> list:
    """a * const, const a host int already in Montgomery form."""
    return mont_mul(field, a, [np.uint32(x) for x in np_limbs(c, field.n_limbs)])


def lerp(field: Field, left: list, right: list, r: list) -> list:
    """left - r*(left - right) — the fold step (evaluation_form.rs:68)."""
    diff = sub_mod(field, left, right)
    return sub_mod(field, left, mont_mul(field, diff, r))
