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


def _ladder_axis2(field: Field, x, perm, stages, scale):
    """DIT ladder transforming axis -2 of (L, n, B) Montgomery limbs.

    TPU-friendly orientation: the batch axis B rides the 128-wide lane
    dimension while butterfly slicing happens on a major axis, so every
    stage is full-lane contiguous work (slicing the minor axis at widths
    below a lane tile — what _ladder_body does for stage m < 256 — makes
    XLA shuffle within lanes instead)."""
    n = x.shape[-2]
    x = jnp.take(x, perm, axis=-2)
    for s, w in enumerate(stages, start=1):
        m = 1 << s
        xb = x.reshape(x.shape[:-2] + (n // m, m, x.shape[-1]))
        e = xb[..., : m // 2, :]
        o = xb[..., m // 2 :, :]
        wb = w.reshape((w.shape[0],) + (1,) * (xb.ndim - 3) + (m // 2, 1))
        t = dev.mont_mul(field, o, wb)
        x = jnp.concatenate(
            [dev.add_mod(field, e, t), dev.sub_mod(field, e, t)], axis=-2
        ).reshape(x.shape)
    if scale is not None:
        x = dev.mont_mul(
            field, x, scale.reshape((scale.shape[0],) + (1,) * (x.ndim - 1))
        )
    return x


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _four_step(field: Field, n1: int, n2: int, inverse: bool, data, p1, p2, twid):
    """Bailey 4-step NTT: view (n1, n2) row-major; column DFTs (length n1)
    batched over the n2 lanes, twiddle w^(i2*k1), one transpose, row DFTs
    (length n2) batched over the n1 lanes.  Output X[k2*n1 + k1] falls out
    flat with no final transpose.

    On a single chip this bounds compile depth (the two ladders are small
    and shared); across a mesh the middle transpose becomes the
    all-to-all (zk_tpu.parallel.ntt)."""
    L = field.n_limbs
    perm1, stages1, scale1 = p1
    perm2, stages2, scale2 = p2
    a = data.reshape(L, n1, n2)  # [i1, i2], i2 on lanes
    y = _ladder_axis2(field, a, perm1, stages1, scale1)  # [k1, i2]
    y = dev.mont_mul(field, y, twid)  # * w^(i2*k1), twid is (L, n1, n2)
    z = _ladder_axis2(
        field, y.transpose(0, 2, 1), perm2, stages2, scale2
    )  # (L, n2, n1): [k2, k1]
    return z.reshape(L, n1 * n2)  # X[k2*n1 + k1]


# ---------------------------------------------------------------------------
# Pallas tier: the whole log2(n_t)-stage DIT ladder runs on one VMEM block
# per grid step (batch on the 128-lane axis, butterflies on a major axis,
# per-stage twiddles baked as kernel constants).  The jnp ladder above is
# the CPU/verification path; this one is ~VPU-rate on TPU.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _packed_twiddles(field: Field, n_t: int, inverse: bool):
    """All per-stage Montgomery twiddle rows packed into one (L, n_t)
    array (stage s at offset 2^(s-1) - ... = m/2, length m/2); passed to
    the Pallas ladder as a broadcast VMEM input (Pallas kernels cannot
    capture array constants)."""
    L = field.n_limbs
    omega = field.get_root_of_unity(n_t)
    if inverse:
        omega = field.inv(omega)
    packed = np.zeros((L, n_t), dtype=np.uint32)
    offsets = []
    off = 0
    for s in range(1, n_t.bit_length()):
        m = 1 << s
        row = _powers_mont(field, pow(omega, n_t // m, field.p), m // 2)
        packed[:, off : off + m // 2] = row
        offsets.append(off)
        off += m // 2
    return jnp.asarray(packed), tuple(offsets)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _ladder_pallas(field: Field, n_t: int, inverse: bool, x):
    """(L, n_t, B) pre-bit-reversed Montgomery limbs -> DFT along axis -2.

    Applies the n_t^-1 scale when inverse (so the 4-step's two ladders
    compose to the full n^-1, matching _plan's split)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zk_tpu.fields import limb_math as lm

    L = field.n_limbs
    B = x.shape[-1]
    bblk = 256  # Mosaic supports the in-kernel stage reshapes only at
    # two-lane-tile minor blocks (empirical: (n_t<=128, bblk=256) OK;
    # bblk=128 or n_t>=256 hit "Unsupported reshape")
    twid, offsets = _packed_twiddles(field, n_t, inverse)
    scale_const = (field.inv(n_t) * field.R) % field.p if inverse else None

    def kernel(x_ref, tw_ref, o_ref):
        cur = [x_ref[i] for i in range(L)]  # (n_t, bblk) each
        for s, off in enumerate(offsets, start=1):
            m = 1 << s
            xb = [v.reshape(n_t // m, m, bblk) for v in cur]
            e = [v[:, : m // 2, :] for v in xb]
            o = [v[:, m // 2 :, :] for v in xb]
            w = [tw_ref[i, off : off + m // 2].reshape(1, m // 2, 1) for i in range(L)]
            t = lm.mont_mul(field, o, w)
            lo_ = lm.add_mod(field, e, t)
            hi_ = lm.sub_mod(field, e, t)
            cur = [
                jnp.concatenate([a, b], axis=1).reshape(n_t, bblk)
                for a, b in zip(lo_, hi_)
            ]
        if scale_const is not None:
            cur = lm.mont_mul_const(field, cur, scale_const)
        for i in range(L):
            o_ref[i] = cur[i]

    spec = pl.BlockSpec((L, n_t, bblk), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((L, n_t), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n_t, B), jnp.uint32),
        grid=(B // bblk,),
        in_specs=[spec, tw_spec],
        out_specs=spec,
    )(x, twid)


def _pallas_radix(field: Field) -> int:
    """Largest ladder length Mosaic compiles for this limb count
    (empirical envelope, see _ladder_pallas)."""
    return 128 if field.n_limbs <= 8 else 64


def _rec_axis2(field: Field, x, T: int, inverse: bool):
    """Recursive Cooley-Tukey DFT along axis -2 of (L, T, B).

    Radix-(<=128) splits T = t1 * t2: column ladders (Pallas, batch on
    lanes), twiddle w_T^(k1*i2) (Pallas elementwise), one transpose,
    recurse on t2.  Each ladder applies its own t^-1 scale for the
    inverse, composing to the full T^-1 (same split as _plan).  Output
    index X[k2*t1 + k1] falls out of the final reshape.  Values are
    identical to _four_step / host_dft (differential-tested)."""
    from zk_tpu.fields.pallas_kernels import mont_mul_pallas, on_tpu

    L = field.n_limbs
    B = x.shape[-1]
    radix = _pallas_radix(field)
    if T <= radix:
        if on_tpu() and B % 256 == 0:
            perm = jnp.asarray(_bit_reverse_perm(T))
            return _ladder_pallas(field, T, inverse, jnp.take(x, perm, axis=-2))
        return _ladder_axis2(field, x, *_plan(field, T, inverse))
    t1 = radix
    t2 = T // t1
    a = x.reshape(L, t1, t2 * B)
    y = _rec_axis2(field, a, t1, inverse)  # [k1, (i2, b)]
    twid = _twiddle_table(field, t2, t1, _twiddle_base_row(field, T, t2, inverse))
    flat = t1 * t2 * B
    if on_tpu() and flat % 1024 == 0:
        tw_full = jnp.broadcast_to(
            twid[:, :, :, None], (L, t1, t2, B)
        ).reshape(L, flat)
        y = mont_mul_pallas(field, y.reshape(L, flat), tw_full)
    else:
        y = dev.mont_mul(field, y.reshape(L, t1, t2, B), twid[:, :, :, None])
    z = y.reshape(L, t1, t2, B).transpose(0, 2, 1, 3).reshape(L, t2, t1 * B)
    z = _rec_axis2(field, z, t2, inverse)  # [k2, (k1, b)]
    return z.reshape(L, T, B)  # [(k2, k1), b] = X[k2*t1 + k1]


def _transform_device(field: Field, data: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    from zk_tpu.fields.pallas_kernels import on_tpu

    n = data.shape[-1]
    if n & (n - 1):
        raise ValueError("values must be a power of 2")
    if n == 1:
        return data
    if n <= _DIRECT_LADDER_MAX:
        perm, stages, scale = _plan(field, n, inverse)
        return _ntt_ladder(field, data, perm, stages, scale)
    if on_tpu():
        L = field.n_limbs
        return _rec_axis2(field, data.reshape(L, n, 1), n, inverse).reshape(L, n)
    logn = n.bit_length() - 1
    n1 = 1 << (logn // 2)
    n2 = n // n1
    # (L, n1, n2) table T[k1, i2] = w^(i2*k1): scan n1 rows of w^i2 powers
    twid = _twiddle_table(field, n2, n1, _twiddle_base_row(field, n, n2, inverse))
    p1 = _plan(field, n1, inverse)
    p2 = _plan(field, n2, inverse)
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
