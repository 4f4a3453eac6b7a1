"""Device-resident Fiat-Shamir transcript: Keccak-256 as XLA ops.

Why: the sumcheck prover's only mandatory host<->device sync is the
per-round Fiat-Shamir challenge (transcript/src/lib.rs:20-30 semantics;
prover.rs:59-64 round loop).  With the sponge state living on device, the
whole n-round prover becomes ONE async dispatch chain — the host enqueues
every round's (sums -> absorb -> squeeze -> challenge -> fold) graph
without ever blocking, and reads all round polys + challenges back with a
single device_get at the end.  On the axon-tunneled single chip this
removes ~n round-trip latencies from the critical path.

Byte-exactness: this module computes the *same* Keccak-256 (original
0x01 multi-rate padding, rate 136) and the same BE-reduction challenge
mapping (``from_be_bytes_mod_order``) as the host tiers; the host state
can be exported to device mid-stream (``Transcript.export_state``) and
re-imported for the host tail — differential-tested against the host
transcript in tests/test_device_transcript.py.

Representation: 25 sponge lanes as two (25,) uint32 arrays (lo, hi 32-bit
halves of each 64-bit lane), a (136,) uint32 byte buffer (zero beyond
``pos``), and ``pos`` as a *static* Python int — append sizes in the
prover are shape-determined, so buffer offsets are known at trace time
and every absorb/squeeze specializes into straight-line XLA.

Challenge derivation stays in limb arithmetic: digest byte j contributes
``b_j * 2^(8*(31-j))`` to the BE integer, so the Montgomery-form
challenge is ``sum_j mont_mul(b_j, 2^(8*(31-j)) * R^2 mod p)`` — 32 tiny
Montgomery mults, no bigint host math.  Requires p > 2^32 (all device
fields; F17 is host-tier only).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field, LIMB_BITS
from zk_tpu.transcript.keccak import _RC, _ROT

U32 = jnp.uint32
RATE = 136
DIGEST = 32

_BYTE_WEIGHTS = np.array([1, 1 << 8, 1 << 16, 1 << 24], dtype=np.uint32)


# --------------------------------------------------------------------------
# Keccak-f[1600], vectorized: state = two (25,) uint32 arrays (64-bit lane
# halves), lane index A[x + 5*y].  All five steps are whole-state vector
# ops (rolls, gathers, masked per-lane shifts) so the jitted graph is
# ~1k small ops instead of ~8k scalars — XLA compiles it in seconds.
# --------------------------------------------------------------------------

# per-lane rho offsets in [y][x] layout (i = x + 5y reshaped to (5, 5))
_ROT_YX = np.array([[_ROT[x][y] for x in range(5)] for y in range(5)], dtype=np.uint32)
_RHO_M = _ROT_YX % 32  # uint32 shift within a 32-bit half
_RHO_MC = (32 - _RHO_M) % 32  # complement (junk where _RHO_M == 0, masked out)
_RHO_SWAP = ((_ROT_YX // 32) % 2) == 1  # odd 32-multiple => halves swap
_RHO_MZ = _RHO_M == 0

# pi as a flat gather: B[y + 5*((2x+3y)%5)] = rho(A)[x + 5y]
_PI_SRC = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y

_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC], dtype=np.uint32)


def _rol2(lo, hi, n: int):
    """64-bit rotate-left by static n over a (lo, hi) uint32 half pair
    (raw lax binds — the 24-round unrolled kernel is ~25k scalar ops and
    jnp dispatch costs ~7x more per op under the Pallas tracer)."""
    from jax import lax

    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n > 32:
        lo, hi = hi, lo
        n -= 32

    def sl(x, k):
        return lax.shift_left(x, lax.full_like(x, np.uint32(k)))

    def sr(x, k):
        return lax.shift_right_logical(x, lax.full_like(x, np.uint32(k)))

    return (
        lax.bitwise_or(sl(lo, n), sr(hi, 32 - n)),
        lax.bitwise_or(sl(hi, n), sr(lo, 32 - n)),
    )


_ROUNDS_PER_KERNEL = 24  # whole permutation in ONE kernel: fewer
# sequential launches on the per-round Fiat-Shamir critical path; the
# lax-emitted body keeps trace + Mosaic compile in budget


def _rounds_kernel_pallas(lo, hi, rcs: tuple):
    """Static subset of Keccak rounds as one Pallas kernel of unrolled
    scalar ops (state in SMEM — 25 uint32 lane-half pairs)."""
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x_ = lax.bitwise_xor
    and_ = lax.bitwise_and
    not_ = lax.bitwise_not

    def kernel(lo_ref, hi_ref, olo_ref, ohi_ref):
        a_lo = [lo_ref[i] for i in range(25)]
        a_hi = [hi_ref[i] for i in range(25)]
        for rc in rcs:
            c_lo = [
                x_(x_(x_(x_(a_lo[x], a_lo[x + 5]), a_lo[x + 10]), a_lo[x + 15]), a_lo[x + 20])
                for x in range(5)
            ]
            c_hi = [
                x_(x_(x_(x_(a_hi[x], a_hi[x + 5]), a_hi[x + 10]), a_hi[x + 15]), a_hi[x + 20])
                for x in range(5)
            ]
            for x in range(5):
                rl, rh = _rol2(c_lo[(x + 1) % 5], c_hi[(x + 1) % 5], 1)
                d_lo = x_(c_lo[(x - 1) % 5], rl)
                d_hi = x_(c_hi[(x - 1) % 5], rh)
                for y in range(5):
                    a_lo[x + 5 * y] = x_(a_lo[x + 5 * y], d_lo)
                    a_hi[x + 5 * y] = x_(a_hi[x + 5 * y], d_hi)
            b_lo = [None] * 25
            b_hi = [None] * 25
            for x in range(5):
                for y in range(5):
                    rl, rh = _rol2(a_lo[x + 5 * y], a_hi[x + 5 * y], _ROT[x][y])
                    b_lo[y + 5 * ((2 * x + 3 * y) % 5)] = rl
                    b_hi[y + 5 * ((2 * x + 3 * y) % 5)] = rh
            a_lo = [
                x_(b_lo[x + 5 * y], and_(not_(b_lo[(x + 1) % 5 + 5 * y]), b_lo[(x + 2) % 5 + 5 * y]))
                for y in range(5)
                for x in range(5)
            ]
            a_hi = [
                x_(b_hi[x + 5 * y], and_(not_(b_hi[(x + 1) % 5 + 5 * y]), b_hi[(x + 2) % 5 + 5 * y]))
                for y in range(5)
                for x in range(5)
            ]
            a_lo[0] = x_(a_lo[0], lax.full_like(a_lo[0], np.uint32(rc & 0xFFFFFFFF)))
            a_hi[0] = x_(a_hi[0], lax.full_like(a_hi[0], np.uint32(rc >> 32)))
        for i in range(25):
            olo_ref[i] = a_lo[i]
            ohi_ref[i] = a_hi[i]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = jax.ShapeDtypeStruct((25,), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out),
        in_specs=[smem, smem],
        out_specs=(smem, smem),
    )(lo, hi)


@jax.jit
def _keccak_f1600_pallas(lo, hi):
    """One full permutation as a chain of scalar Pallas round kernels."""
    R = _ROUNDS_PER_KERNEL
    for s in range(0, 24, R):
        lo, hi = _rounds_kernel_pallas(lo, hi, tuple(_RC[s : s + R]))
    return lo, hi


def keccak_f1600_device(lo, hi):
    """One permutation over (25,) uint32 lane-half arrays (Pallas kernel
    on TPU, fused XLA vector ops elsewhere)."""
    from zk_tpu.fields.pallas_kernels import on_tpu

    if on_tpu():
        return _keccak_f1600_pallas(lo, hi)
    return _keccak_f1600_xla(lo, hi)


def _keccak_f1600_xla(lo, hi):
    """One permutation over (25,) uint32 lane-half arrays."""
    lo = lo.reshape(5, 5)  # [y][x]
    hi = hi.reshape(5, 5)
    for r in range(24):
        # theta: column parities, d[x] = c[x-1] ^ rol64(c[x+1], 1)
        clo = lo[0] ^ lo[1] ^ lo[2] ^ lo[3] ^ lo[4]  # (5,) over x
        chi_ = hi[0] ^ hi[1] ^ hi[2] ^ hi[3] ^ hi[4]
        c1lo, c1hi = jnp.roll(clo, -1), jnp.roll(chi_, -1)
        r1lo = (c1lo << 1) | (c1hi >> 31)
        r1hi = (c1hi << 1) | (c1lo >> 31)
        dlo = jnp.roll(clo, 1) ^ r1lo
        dhi = jnp.roll(chi_, 1) ^ r1hi
        lo = lo ^ dlo[None, :]
        hi = hi ^ dhi[None, :]
        # rho: per-lane 64-bit rotation via masked 32-bit shifts
        alo = jnp.where(_RHO_SWAP, hi, lo)
        ahi = jnp.where(_RHO_SWAP, lo, hi)
        nlo = jnp.where(_RHO_MZ, alo, (alo << _RHO_M) | (ahi >> _RHO_MC))
        nhi = jnp.where(_RHO_MZ, ahi, (ahi << _RHO_M) | (alo >> _RHO_MC))
        # pi: fixed permutation (flat gather)
        nlo = nlo.reshape(25)[_PI_SRC].reshape(5, 5)
        nhi = nhi.reshape(25)[_PI_SRC].reshape(5, 5)
        # chi: a = b ^ (~b[x+1] & b[x+2]) along x
        lo = nlo ^ (~jnp.roll(nlo, -1, axis=1) & jnp.roll(nlo, -2, axis=1))
        hi = nhi ^ (~jnp.roll(nhi, -1, axis=1) & jnp.roll(nhi, -2, axis=1))
        # iota
        lo = lo.at[0, 0].set(lo[0, 0] ^ _RC_LO[r])
        hi = hi.at[0, 0].set(hi[0, 0] ^ _RC_HI[r])
    return lo.reshape(25), hi.reshape(25)


def _absorb_block(lo, hi, block):
    """XOR a (RATE,) uint32 byte block into the state and permute."""
    words = jnp.sum(
        block.reshape(RATE // 8, 2, 4) * _BYTE_WEIGHTS, axis=-1, dtype=U32
    )  # (17, 2) little-endian lane halves
    lo = lo.at[: RATE // 8].set(lo[: RATE // 8] ^ words[:, 0])
    hi = hi.at[: RATE // 8].set(hi[: RATE // 8] ^ words[:, 1])
    return keccak_f1600_device(lo, hi)


def absorb(lo, hi, buf, pos: int, data):
    """Absorb a static-length byte vector; returns (lo, hi, buf, new_pos).

    ``buf`` keeps the invariant bytes beyond ``pos`` are zero.  ``pos``
    and ``data.shape`` are static, so block boundaries resolve at trace
    time (mirrors Keccak256.update's buffering, keccak.py:75-85).
    """
    m = int(data.shape[0])
    cat = jnp.concatenate([buf[:pos], data.astype(U32)]) if pos else data.astype(U32)
    total = pos + m
    nblocks = total // RATE
    for b in range(nblocks):
        lo, hi = _absorb_block(lo, hi, cat[b * RATE : (b + 1) * RATE])
    rem = total % RATE
    new_buf = jnp.zeros(RATE, U32)
    if rem:
        new_buf = new_buf.at[:rem].set(cat[nblocks * RATE :])
    return lo, hi, new_buf, rem


def squeeze(lo, hi, buf, pos: int):
    """32-byte digest of everything absorbed (keccak.py:87-98): pad the
    pending block (0x01 ... 0x80 multi-rate), permute a COPY, read the
    first 4 lanes little-endian.  Running state is not mutated."""
    if pos == RATE - 1:
        block = buf.at[pos].set(np.uint32(0x81))
    else:
        block = buf.at[pos].set(np.uint32(0x01)).at[RATE - 1].set(np.uint32(0x80))
    plo, phi = _absorb_block(lo, hi, block)
    shifts = np.array([0, 8, 16, 24], dtype=np.uint32)
    lob = (plo[:4, None] >> shifts) & np.uint32(0xFF)  # (4, 4)
    hib = (phi[:4, None] >> shifts) & np.uint32(0xFF)
    return jnp.concatenate([lob, hib], axis=1).reshape(32)  # (32,) bytes


def sample_challenge(lo, hi, buf, pos: int):
    """transcript/src/lib.rs:20-25: digest, reset, re-absorb the digest.

    Returns (lo, hi, buf, new_pos=32, digest)."""
    digest = squeeze(lo, hi, buf, pos)
    z = jnp.zeros(25, U32)
    lo, hi, buf, rem = absorb(z, z, jnp.zeros(RATE, U32), 0, digest)
    assert rem == DIGEST
    return lo, hi, buf, rem, digest


# --------------------------------------------------------------------------
# digest -> field element (BE reduction mod p), in limb arithmetic
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _challenge_consts(field: Field) -> np.ndarray:
    """(L, 32): column j holds canonical limbs of 2^(8*(31-j)) * R^2 mod p,
    so mont_mul(byte_j, col_j) = byte_j * 2^(8*(31-j)) * R mod p — the
    Montgomery form of that byte's contribution to the BE integer."""
    L = field.n_limbs
    out = np.zeros((L, DIGEST), dtype=np.uint32)
    for j in range(DIGEST):
        c = (pow(2, 8 * (DIGEST - 1 - j), field.p) * field.R2) % field.p
        out[:, j] = dev._int_to_limbs(c, L)
    return out


def challenge_from_digest(field: Field, digest):
    """(32,) uint32 digest bytes -> (mont (L,1), canonical (L,1)) challenge
    limbs, = from_be_bytes_mod_order(digest) (transcript/src/lib.rs:27-30).
    """
    if field.p <= (1 << 32):
        raise ValueError("device transcript requires p > 2^32")
    L = field.n_limbs
    b = jnp.zeros((L, DIGEST), U32).at[0].set(digest)
    prods = dev.mont_mul(field, b, jnp.asarray(_challenge_consts(field)))
    mont = dev.sum_mod(field, prods, -1).reshape(L, 1)
    one = dev.scalar(field, 1, mont=False)
    canon = dev.mont_mul(field, mont, one)
    return mont, canon


# --------------------------------------------------------------------------
# canonical-element serialization (device side of elements_to_bytes)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _byte_gather(field: Field) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (limb_index, shift, valid) per BE byte position of one
    canonical element (n_bytes wide, arkworks layout — field.py:94-96)."""
    nb, L = field.n_bytes, field.n_limbs
    idx = np.zeros(nb, dtype=np.int32)
    shift = np.zeros(nb, dtype=np.uint32)
    valid = np.zeros(nb, dtype=np.uint32)
    for bpos in range(nb):
        q = nb - 1 - bpos  # byte significance (0 = least)
        if q // 2 < L:
            idx[bpos] = q // 2
            shift[bpos] = 8 * (q % 2)
            valid[bpos] = 0xFF
    return idx, shift, valid


def serialize_canonical(field: Field, elems):
    """(L, count) canonical limb tensor -> (count * n_bytes,) uint32 byte
    values, elements concatenated in order, each big-endian
    (sumcheck/src/lib.rs:23-29 / field.py elements_to_bytes)."""
    idx, shift, valid = _byte_gather(field)
    # (nb, count): byte bpos of every element
    mat = (elems[idx, :] >> shift[:, None]) & valid[:, None]
    return jnp.transpose(mat).reshape(-1).astype(U32)


# --------------------------------------------------------------------------
# host <-> device state migration
# --------------------------------------------------------------------------


def state_to_device(lanes, buf: bytes):
    """Host sponge state (25 lane ints, pending bytes) -> device arrays
    (lo, hi, buf, pos)."""
    lo = jnp.asarray(np.array([l & 0xFFFFFFFF for l in lanes], dtype=np.uint32))
    hi = jnp.asarray(np.array([l >> 32 for l in lanes], dtype=np.uint32))
    b = np.zeros(RATE, dtype=np.uint32)
    b[: len(buf)] = np.frombuffer(bytes(buf), dtype=np.uint8)
    return lo, hi, jnp.asarray(b), len(buf)


def state_to_host(lo, hi, buf, pos: int):
    """Device transcript state -> (25 lane ints, pending bytes) for
    Transcript.import_state (single device_get)."""
    lo_h, hi_h, buf_h = jax.device_get((lo, hi, buf))
    lanes = [int(lo_h[i]) | (int(hi_h[i]) << 32) for i in range(25)]
    pend = bytes(int(x) & 0xFF for x in buf_h[:pos])
    return lanes, pend
