"""Radix-2 NTT / iNTT over FFT-friendly prime fields (device tier).

Black-box spec: fft/src/lib.rs — natural order in, natural order out,
omega = F::get_root_of_unity(n) (arkworks generator^((p-1)/2^s) chain),
ifft = same transform with omega^-1 followed by a global n^-1 scale
(fft/src/lib.rs:4-19).  The output is the DFT matrix applied to the
input, so the algorithm is free: instead of the reference's
allocation-heavy recursion with per-twiddle pow (fft/src/lib.rs:21-46),
we run an iterative decimation-in-time ladder on the (L, n) limb tensor —
one bit-reversal gather, then log2(n) stages of contiguous-slice
butterflies with precomputed per-stage Montgomery twiddle tables.  Each
stage is one mont_mul + add_mod + sub_mod over n/2 lanes; XLA fuses the
whole ladder into a single program.

Twiddle tables and the bit-reversal permutation are computed host-side
once per (field, n) and cached; they enter the graph as device arguments
(not constants) so the compiled kernel is reused across calls.

The multi-chip Bailey 4-step factorization (local NTT -> all-to-all
transpose -> twiddle -> local NTT) lives in zk_tpu.parallel.ntt.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field, LIMB_BITS, LIMB_MASK


def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    perm = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(logn):
        rev |= ((perm >> b) & 1) << (logn - 1 - b)
    return rev


def _powers_mont(field: Field, base: int, count: int) -> np.ndarray:
    """[base^0, ..., base^(count-1)] as (L, count) Montgomery limbs."""
    out = np.empty((field.n_limbs, count), dtype=np.uint32)
    cur = 1
    for j in range(count):
        v = (cur * field.R) % field.p
        for i in range(field.n_limbs):
            out[i, j] = (v >> (LIMB_BITS * i)) & LIMB_MASK
        cur = (cur * base) % field.p
    return out


@functools.lru_cache(maxsize=None)
def _plan(field: Field, n: int, inverse: bool):
    """(perm, per-stage twiddle arrays, optional n^-1 scale) for size n."""
    omega = field.get_root_of_unity(n)
    if inverse:
        omega = field.inv(omega)
    logn = n.bit_length() - 1
    stages = []
    for s in range(1, logn + 1):
        m = 1 << s
        w_m = pow(omega, n // m, field.p)
        stages.append(jnp.asarray(_powers_mont(field, w_m, m // 2)))
    perm = jnp.asarray(_bit_reverse_perm(n))
    scale = None
    if inverse:
        scale = jnp.asarray(dev.const_limbs(field, field.inv(n))).reshape(
            field.n_limbs, 1
        )
    return perm, tuple(stages), scale


def _ladder_body(field: Field, x, perm, stages, scale):
    """DIT ladder on (L, *batch, n) Montgomery limbs, last axis transformed."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    x = jnp.take(x, perm, axis=-1)
    for s, w in enumerate(stages, start=1):
        m = 1 << s
        xb = x.reshape(lead + (n // m, m))
        e = xb[..., : m // 2]
        o = xb[..., m // 2 :]
        wb = w.reshape((w.shape[0],) + (1,) * (len(lead) - 1) + (1, m // 2))
        t = dev.mont_mul(field, o, wb)
        x = jnp.concatenate(
            [dev.add_mod(field, e, t), dev.sub_mod(field, e, t)], axis=-1
        ).reshape(lead + (n,))
    if scale is not None:
        sc = scale.reshape((scale.shape[0],) + (1,) * (len(lead) - 1) + (1,))
        x = dev.mont_mul(field, x, sc)
    return x


@functools.partial(jax.jit, static_argnums=0)
def _ntt_ladder(field: Field, data, perm, stages, scale):
    """data: (L, *batch, n) Montgomery limbs -> DFT along the last axis,
    natural order in/out."""
    return _ladder_body(field, data, perm, stages, scale)


# sizes above this use the 4-step factorization (bounds ladder compile depth)
_DIRECT_LADDER_MAX = 1 << 12


@functools.lru_cache(maxsize=None)
def _twiddle_base_row(field: Field, n: int, n1: int, inverse: bool):
    """(L, n1) Montgomery powers [w^0 .. w^(n1-1)] of the size-n root."""
    omega = field.get_root_of_unity(n)
    if inverse:
        omega = field.inv(omega)
    return jnp.asarray(_powers_mont(field, omega, n1))


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _twiddle_table(field: Field, n1: int, n2: int, base_row):
    """(L, n2, n1) Montgomery table T[i2, k1] = w^(i2*k1), built on device
    as a cumulative Montgomery-product scan of the base power row."""
    ones = jnp.broadcast_to(
        jnp.asarray(dev.const_limbs(field, 1)).reshape(field.n_limbs, 1),
        base_row.shape,
    )

    def body(carry, _):
        return dev.mont_mul(field, carry, base_row), carry

    _, rows = jax.lax.scan(body, ones, None, length=n2)
    return rows.transpose(1, 0, 2)  # (L, n2, n1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _four_step(field: Field, n1: int, n2: int, inverse: bool, data, p1, p2, twid):
    """Bailey 4-step NTT: view (n1, n2) row-major; column DFTs (length n1),
    twiddle w^(i2*k1), row DFTs (length n2), transpose out.

    On a single chip this bounds compile depth (the two ladders are small
    and shared); across a mesh the middle transpose becomes the
    all-to-all (zk_tpu.parallel.ntt)."""
    L = field.n_limbs
    perm1, stages1, scale1 = p1
    perm2, stages2, scale2 = p2
    a = data.reshape(L, n1, n2).transpose(0, 2, 1)  # (L, n2, n1): [i2, i1]
    y = _ladder_body(field, a, perm1, stages1, scale1)  # [i2, k1]
    y = dev.mont_mul(field, y, twid)  # * w^(i2*k1)
    z = _ladder_body(field, y.transpose(0, 2, 1), perm2, stages2, scale2)  # [k1, k2]
    return z.transpose(0, 2, 1).reshape(L, n1 * n2)  # X[k2*n1 + k1]


def _transform_device(field: Field, data: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = data.shape[-1]
    if n & (n - 1):
        raise ValueError("values must be a power of 2")
    if n == 1:
        return data
    if n <= _DIRECT_LADDER_MAX:
        perm, stages, scale = _plan(field, n, inverse)
        return _ntt_ladder(field, data, perm, stages, scale)
    logn = n.bit_length() - 1
    n1 = 1 << (logn // 2)
    n2 = n // n1
    p1 = _plan(field, n1, inverse)
    p2 = _plan(field, n2, inverse)
    twid = _twiddle_table(field, n1, n2, _twiddle_base_row(field, n, n1, inverse))
    return _four_step(field, n1, n2, inverse, data, p1, p2, twid)


def ntt_device(field: Field, data: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT on a (L, n) Montgomery limb tensor."""
    return _transform_device(field, data, inverse=False)


def intt_device(field: Field, data: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT on a (L, n) Montgomery limb tensor (fft/src/lib.rs:11-19)."""
    return _transform_device(field, data, inverse=True)


def ntt(field: Field, coefficients: list[int]) -> list[int]:
    """Host-convenience forward NTT (fft/src/lib.rs:4-8 `fft`)."""
    if len(coefficients) == 1:
        return [c % field.p for c in coefficients]
    return dev.decode_ints(field, ntt_device(field, dev.encode_ints(field, coefficients)))


def intt(field: Field, evaluations: list[int]) -> list[int]:
    """Host-convenience inverse NTT (fft/src/lib.rs:11-19 `ifft`)."""
    if len(evaluations) == 1:
        return [c % field.p for c in evaluations]
    return dev.decode_ints(field, intt_device(field, dev.encode_ints(field, evaluations)))


# reference-parity aliases (fft/src/lib.rs naming)
fft = ntt
ifft = intt


@functools.lru_cache(maxsize=None)
def _plan_for_root(field: Field, n: int, omega: int):
    """Ladder plan for a caller-supplied primitive n-th root."""
    logn = n.bit_length() - 1
    stages = tuple(
        jnp.asarray(_powers_mont(field, pow(omega, n >> s, field.p), (1 << s) // 2))
        for s in range(1, logn + 1)
    )
    return jnp.asarray(_bit_reverse_perm(n)), stages


def ntt_with_root(field: Field, values: list[int], omega: int) -> list[int]:
    """``fft_internal`` parity (fft/src/lib.rs:21-46): the DFT with a
    caller-supplied root of unity (the reference exposes this to build
    ifft from fft; here it also enables coset transforms)."""
    n = len(values)
    if n == 1:
        return [v % field.p for v in values]
    if n & (n - 1):
        raise ValueError("values must be a power of 2")
    if pow(omega, n, field.p) != 1 or pow(omega, n // 2, field.p) == 1:
        raise ValueError("omega must be a primitive n-th root of unity")
    perm, stages = _plan_for_root(field, n, omega % field.p)
    out = _ntt_ladder(field, dev.encode_ints(field, values), perm, stages, None)
    return dev.decode_ints(field, out)


def host_dft(field: Field, values: list[int], inverse: bool = False) -> list[int]:
    """O(n^2) reference DFT in exact host ints — the differential oracle
    for kernel tests (matches fft_internal's output by the DFT definition)."""
    n = len(values)
    omega = field.get_root_of_unity(n)
    if inverse:
        omega = field.inv(omega)
    out = []
    for i in range(n):
        acc = 0
        for j, v in enumerate(values):
            acc = (acc + v * pow(omega, i * j, field.p)) % field.p
        out.append(acc)
    if inverse:
        n_inv = field.inv(n)
        out = [(v * n_inv) % field.p for v in out]
    return out
