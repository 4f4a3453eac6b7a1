"""Value-level limb arithmetic for Pallas TPU kernels.

All functions operate on Python lists of same-shaped uint32 jnp arrays
(one list entry per base-2^16 limb).  This is the in-kernel counterpart
of zk_tpu.fields.device: the jnp tier keeps a stacked slice-accumulate
formulation (small XLA graphs), while inside a Pallas kernel the limb
loops unroll onto register tiles where Mosaic schedules them directly.
The two implementations are differential-tested against each other and
against exact host ints (tests/test_pallas_kernels.py).

Every op is emitted through raw ``jax.lax`` primitives rather than the
jnp operator layer: a fused fold/sums kernel body is tens of thousands
of scalar limb ops, and under the Pallas tracer each jnp dispatch costs
~200us vs ~30us for a direct lax bind — the difference between a ~15s
and a ~2s kernel trace (cold-start, measured round 3).  Constants are
materialized once per call with ``lax.full_like`` and shapes are
broadcast explicitly up front (lax has no implicit broadcasting).

Invariants (see device.py module docstring for the full argument):
  * proper limbs are < 2^16; every 16x16 product is exact in uint32;
  * relaxed convolution columns accumulate <= 2L lo/hi terms < 2^22;
  * Montgomery reduce output u < 2p -> single conditional subtract.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from zk_tpu.fields.field import Field, LIMB_BITS, LIMB_MASK

_B = LIMB_BITS


def np_limbs(value: int, n: int) -> list[np.uint32]:
    return [np.uint32((value >> (_B * i)) & LIMB_MASK) for i in range(n)]


def _cst(proto, v) -> jnp.ndarray:
    """uint32 constant array shaped like proto (one cheap lax bind)."""
    return lax.full_like(proto, np.uint32(v))


def _normalize(xs: list, proto):
    """Scalars -> constant arrays, smaller arrays -> broadcast to proto's
    shape, so every subsequent op is an exact-shape lax bind."""
    out = []
    for x in xs:
        if isinstance(x, (int, np.integer)):
            out.append(_cst(proto, x))
        elif getattr(x, "shape", None) != proto.shape:
            out.append(jnp.broadcast_to(x, proto.shape))
        else:
            out.append(x)
    return out


def _widest(*lists):
    """The operand with the largest element count (broadcast target)."""
    best = None
    for xs in lists:
        for x in xs:
            if isinstance(x, (int, np.integer)):
                continue
            if best is None or x.size > best.size:
                best = x
    return best


def conv_acc(xs: list, ys: list, n_cols: int) -> list:
    """Relaxed limb convolution columns of x * y, truncated to n_cols.

    ys entries may be numpy scalars (constants) or arrays.  Column k gets
    lo(x_i*y_j) for i+j == k and hi for i+j == k-1.
    """
    proto = _widest(xs, ys)
    xs = _normalize(xs, proto)
    ys = _normalize(ys, proto)
    mask = _cst(proto, LIMB_MASK)
    shift = _cst(proto, _B)
    cols = [None] * n_cols

    def add(k, v):
        if k < n_cols:
            cols[k] = v if cols[k] is None else lax.add(cols[k], v)

    for j in range(len(ys)):
        if j >= n_cols:
            break
        for i in range(len(xs)):
            if i + j >= n_cols:
                break
            prod = lax.mul(xs[i], ys[j])
            add(i + j, lax.bitwise_and(prod, mask))
            add(i + j + 1, lax.shift_right_logical(prod, shift))
    zero = _cst(proto, 0)
    return [zero if c is None else c for c in cols]


def carry_prop(cols: list):
    """Relaxed columns (< 2^32) -> proper 16-bit limbs + final carry."""
    proto = cols[0]
    mask = _cst(proto, LIMB_MASK)
    shift = _cst(proto, _B)
    out = []
    carry = None
    for c in cols:
        v = c if carry is None else lax.add(c, carry)
        out.append(lax.bitwise_and(v, mask))
        carry = lax.shift_right_logical(v, shift)
    return out, carry


def sub_const_borrow(a: list, b_const: list[np.uint32]):
    """a - b for constant b; returns (diff limbs, borrow flag array)."""
    proto = a[0]
    shift = _cst(proto, _B)
    one = _cst(proto, 1)
    out = []
    borrow = None
    for i in range(len(a)):
        # (2^16 - b_i) folded into one host-side constant
        t = lax.add(a[i], _cst(proto, (1 << _B) - int(b_const[i])))
        if borrow is not None:
            t = lax.sub(t, borrow)
        out.append(lax.bitwise_and(t, _cst(proto, LIMB_MASK)))
        borrow = lax.sub(one, lax.shift_right_logical(t, shift))
    return out, borrow


def cond_sub_p(field: Field, limbs: list, extra_top=None) -> list:
    """If u >= p (extra_top = optional R-carry), subtract p."""
    p_const = np_limbs(field.p, field.n_limbs)
    diff, borrow = sub_const_borrow(limbs, p_const)
    zero = _cst(borrow, 0)
    ge = lax.eq(borrow, zero)
    if extra_top is not None:
        if getattr(extra_top, "shape", None) != zero.shape:
            extra_top = jnp.broadcast_to(extra_top, zero.shape)
        ge = lax.bitwise_or(ge, lax.gt(extra_top, zero))
    return [lax.select(ge, d, u) for d, u in zip(diff, limbs)]


def add_mod(field: Field, a: list, b: list) -> list:
    proto = _widest(a, b)
    a = _normalize(a, proto)
    b = _normalize(b, proto)
    limbs, carry = carry_prop([lax.add(x, y) for x, y in zip(a, b)])
    return cond_sub_p(field, limbs, extra_top=carry)


def sub_mod(field: Field, a: list, b: list) -> list:
    """a + (p - b) with one conditional subtract (b < p exact)."""
    proto = _widest(a, b)
    a = _normalize(a, proto)
    b = _normalize(b, proto)
    p_const = np_limbs(field.p, field.n_limbs)
    mask = _cst(proto, LIMB_MASK)
    shift = _cst(proto, _B)
    one = _cst(proto, 1)
    c = []
    borrow = None
    for i in range(field.n_limbs):
        t = lax.sub(_cst(proto, int(p_const[i]) + (1 << _B)), b[i])
        if borrow is not None:
            t = lax.sub(t, borrow)
        c.append(lax.bitwise_and(t, mask))
        borrow = lax.sub(one, lax.shift_right_logical(t, shift))
    limbs, carry = carry_prop([lax.add(x, y) for x, y in zip(a, c)])
    return cond_sub_p(field, limbs, extra_top=carry)


def mont_reduce(field: Field, t: list) -> list:
    """Montgomery-reduce a proper (L+1)-limb value T < R*p -> T/R mod p."""
    L = field.n_limbs
    ppl = np_limbs(field.p_inv_neg, L)
    pl = np_limbs(field.p, L)
    m, _ = carry_prop(conv_acc(t[:L], ppl, L))
    mp = conv_acc(m, pl, 2 * L + 1)
    _, low_carry = carry_prop([lax.add(x, y) for x, y in zip(mp[:L], t[:L])])
    u_cols = [lax.add(lax.add(mp[L], t[L]), low_carry)] + mp[L + 1 :]
    u, _top = carry_prop(u_cols)
    return cond_sub_p(field, u[:L], extra_top=u[L])


def mont_mul(field: Field, a: list, b: list) -> list:
    """(a * b * R^-1) mod p; a, b proper Montgomery limbs < p."""
    L = field.n_limbs
    cols = conv_acc(a, b, 2 * L + 1)
    t_lo, carry = carry_prop(cols[:L])
    t_hi0 = lax.add(cols[L], carry)
    t_hi_rest = cols[L + 1 :]
    # t is now L proper limbs + (L+1) relaxed columns; mont_reduce needs the
    # relaxed high part normalized lazily — fold it through the same path:
    ppl = np_limbs(field.p_inv_neg, L)
    pl = np_limbs(field.p, L)
    m, _ = carry_prop(conv_acc(t_lo, ppl, L))
    mp = conv_acc(m, pl, 2 * L + 1)
    _, low_carry = carry_prop([lax.add(x, y) for x, y in zip(mp[:L], t_lo)])
    u_cols = [lax.add(lax.add(t_hi0, mp[L]), low_carry)] + [
        lax.add(t_hi_rest[i], mp[L + 1 + i]) for i in range(L)
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
